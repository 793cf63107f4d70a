"""Dataset-provider modes: colmap layout, split merges, video split, linear color space."""

import json
import os
import shutil

import numpy as np
import pytest

from palettenerf_tpu.config import Config
from palettenerf_tpu.data.provider import NeRFDataset
from palettenerf_tpu.data.palette_provider import PaletteDataset


@pytest.fixture()
def blender_scene(tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from synthetic import make_sphere_dataset

    root = str(tmp_path / "scene")
    make_sphere_dataset(root, n_train=4, n_val=2, n_test=2, H=16, W=16)
    return root


def test_colmap_mode(blender_scene, tmp_path):
    """transforms.json single-file layout: first frame becomes val, rest train; test
    split is a slerp path without images (provider.py:115-120, 169-194)."""
    root = str(tmp_path / "colmap")
    os.makedirs(root)
    shutil.copytree(os.path.join(blender_scene, "train"), os.path.join(root, "train"))
    with open(os.path.join(blender_scene, "transforms_train.json")) as f:
        t = json.load(f)
    # colmap-style: fl_x instead of camera_angle, explicit file extensions
    fl = 16 / (2 * np.tan(t["camera_angle_x"] / 2))
    for fr in t["frames"]:
        fr["file_path"] = fr["file_path"] + ".png"
    t2 = {"fl_x": fl, "fl_y": fl, "cx": 8, "cy": 8, "frames": t["frames"]}
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump(t2, f)

    cfg = Config(path=root, bound=1.0, scale=0.5, num_rays=32, seed=0)
    train = NeRFDataset(cfg, type="train")
    val = NeRFDataset(cfg, type="val")
    assert train.mode == "colmap" and val.mode == "colmap"
    assert len(train.poses) == 3 and len(val.poses) == 1  # 4 frames: 1 held out
    assert train.intrinsics[0] == pytest.approx(fl)

    test = NeRFDataset(cfg, type="test", n_test=5)
    assert len(test.poses) == 6  # n_test + 1 interpolated poses
    assert not test.has_gt


def test_trainval_and_traintest_merges(blender_scene):
    cfg = Config(path=blender_scene, bound=1.0, scale=0.5, num_rays=32, seed=0)
    tv = NeRFDataset(cfg, type="trainval")
    assert len(tv.poses) == 6  # 4 train + 2 val (provider.py:139-144)
    tt = NeRFDataset(cfg, type="traintest")
    assert len(tt.poses) == 4  # train only, full images (provider.py:146-148)
    assert tt.has_gt


def test_video_split_poses_only(blender_scene):
    # video transforms: poses with nonexistent file paths (palette/provider.py:152,198)
    with open(os.path.join(blender_scene, "transforms_test.json")) as f:
        t = json.load(f)
    for fr in t["frames"]:
        fr["file_path"] = "---"
    with open(os.path.join(blender_scene, "transforms_video.json"), "w") as f:
        json.dump(t, f)
    cfg = Config(path=blender_scene, bound=1.0, scale=0.5, seed=0, H=16, W=16)
    vid = PaletteDataset(cfg, type="video")
    assert len(vid.poses) == 2
    assert not vid.has_gt
    b = vid.collate(0)
    assert "images" not in b
    assert b["rays_o"].shape == (16 * 16, 3)


def test_linear_color_space_roundtrip(blender_scene):
    """color_space='linear' converts gt in the train step (nerf/utils.py:511-512)."""
    import jax

    from palettenerf_tpu.models.nerf import NeRFSpec
    from palettenerf_tpu.train.trainer import Trainer

    cfg = Config(path=blender_scene, bound=1.0, scale=0.5, dt_gamma=0.0, min_near=0.05,
                 num_rays=32, iters=2, max_steps=32, grid_size=64,
                 train_samples_per_ray=8, infer_samples_per_ray=16,
                 color_space="linear", seed=0, update_extra_interval=2,
                 grid_levels=4, log2_hashmap_size=13)
    spec = NeRFSpec.build(bound=1.0, grid_levels=4, log2_hashmap_size=13)
    import tempfile

    with tempfile.TemporaryDirectory() as ws:
        tr = Trainer("ngp", cfg, spec, workspace=ws, use_checkpoint="scratch", mute=True)
        ds = NeRFDataset(cfg, type="train")
        tr.train(ds, None, 1)
        assert np.isfinite(tr.stats["loss"][-1])
