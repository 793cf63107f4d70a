"""Headless GUI capability surface (EditingSession) — every reference GUI control
must be reachable programmatically (reference palette/gui.py + nerf/gui.py; the
DPG widget layer in gui/dpg_gui.py calls exactly these methods)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from palettenerf_tpu.config import Config
from palettenerf_tpu.gui.camera import OrbitCamera
from palettenerf_tpu.gui.headless import EditingSession


@pytest.fixture(scope="module")
def small_palette_trainer(tmp_path_factory):
    from synthetic import make_sphere_dataset

    from palettenerf_tpu.models.palette import PaletteSpec
    from palettenerf_tpu.train.palette_trainer import PaletteTrainer

    tmp = tmp_path_factory.mktemp("gui")
    root = str(tmp / "scene")
    make_sphere_dataset(root, n_train=3, n_val=1, n_test=1, H=16, W=16)
    cfg = Config(path=root, bound=1.0, scale=0.5, dt_gamma=0.0, min_near=0.05,
                 num_rays=64, iters=4, max_steps=32, grid_size=64,
                 train_samples_per_ray=8, infer_samples_per_ray=16,
                 num_basis=4, seed=0, update_extra_interval=2,
                 grid_levels=4, log2_hashmap_size=13)
    spec = PaletteSpec.build(bound=1.0, num_basis=4, grid_levels=4,
                             log2_hashmap_size=13)
    tr = PaletteTrainer("palette", cfg, spec, workspace=str(tmp / "ws"),
                        use_checkpoint="scratch", nerf_path=None, mute=True)
    from palettenerf_tpu.data.palette_provider import PaletteDataset

    ds = PaletteDataset(cfg, type="train")
    tr.train(ds, None, 1)   # one epoch so the grid is initialized
    # make the barely-trained field opaque so frames have foreground pixels to
    # pick/edit (same trick as test_eval_compact). The palette trainer keeps its
    # occupancy grid frozen (reference parity: PaletteRenderer has no
    # update_extra_state), so from scratch it is empty — open it fully.
    import dataclasses

    import jax.numpy as jnp

    tr.eval_settings = dataclasses.replace(tr.eval_settings, density_scale=30.0)
    tr.grid_state = tr.grid_state._replace(
        bitfield=jnp.full_like(tr.grid_state.bitfield, 255))
    tr._build_jit_fns()
    return tr, ds


def _session(tr, W=24, H=24):
    return EditingSession(tr, W=W, H=H, radius=2.2)


def test_render_pick_recolor_region(small_palette_trainer):
    tr, _ = small_palette_trainer
    sess = _session(tr)
    f = sess.render()
    assert f["image"].shape == (24, 24, 3)
    p = sess.pick(12, 12)
    assert p["xyz"].shape == (3,)
    sess.set_region(mean_xyz=p["xyz"], std_xyz=0.2)
    sess.recolor(1, [0.9, 0.1, 0.1])
    f2 = sess.render()
    assert np.abs(f2["image"] - f["image"]).max() > 1e-4  # edit changed the frame
    sess.reset_colors()


def test_weight_mode_and_dials(small_palette_trainer):
    tr, _ = small_palette_trainer
    sess = _session(tr)
    # view-dep color still adds on top of the mask (reference semantics) — zero
    # its dial so the visualization is exactly gray
    sess.set_weights(view_dep_weight=0.0)
    sess.set_region(mean_xyz=(0, 0, 0), std_xyz=0.5, weight_mode=True)
    f = sess.render()
    img = np.asarray(f["image"])
    assert np.allclose(img[..., 0], img[..., 1], atol=1e-5)  # mask visualization is gray
    sess.set_region(weight_mode=False)
    sess.set_weights(offsets_weight=0.0, view_dep_weight=0.0)
    sess.render()


def test_dynamic_resolution_and_spp_accumulation(small_palette_trainer):
    tr, _ = small_palette_trainer
    sess = _session(tr)
    out1 = sess.render_dynamic(target_ms=1e9)  # huge budget: downscale rises to 1
    assert out1["spp"] == 1
    out2 = sess.render_dynamic(target_ms=1e9)  # same pose: accumulates
    assert out2["spp"] == 2
    sess.cam.orbit(5, 0)
    out3 = sess.render_dynamic(target_ms=1e9)  # camera moved: accumulation resets
    assert out3["spp"] == 1
    # tiny budget: downscale must shrink below 1
    sess.cam.orbit(5, 0)
    out4 = sess.render_dynamic(target_ms=1e-3)
    assert out4["downscale"] < 1.0


def test_train_burst_ckpt_and_pose_jump(small_palette_trainer):
    tr, ds = small_palette_trainer
    sess = _session(tr)
    step0 = tr.global_step
    stats = sess.train_burst(ds, steps=2)
    assert tr.global_step == step0 + 2 and np.isfinite(stats["loss"])
    sess.save_checkpoint()
    assert any(f.endswith(".ckpt") for f in os.listdir(
        os.path.join(tr.workspace, "checkpoints")))
    # test-pose jump: camera reproduces a dataset pose
    pose = np.asarray(ds.poses[0])
    cam = OrbitCamera(24, 24, r=float(np.linalg.norm(pose[:3, 3])))
    cam.set_pose(pose)
    np.testing.assert_allclose(cam.pose, pose, atol=1e-5)
    sess.jump_to_pose(ds.poses, 0)
    sess.render()


def test_style_correspondence_workflow(small_palette_trainer):
    tr, _ = small_palette_trainer
    sess = _session(tr)
    sess.render()
    n = sess.add_correspondence(12, 12, [1.0, 0.2, 0.2])
    assert n == 1
    sess.add_correspondence(8, 14, [0.2, 0.2, 1.0])
    sty = sess.optimize_style(iters=10)
    assert sess._stylizer is sty
    f_on = sess.render()
    sess.use_style(False)
    f_off = sess.render()
    assert np.abs(np.asarray(f_on["image"]) - np.asarray(f_off["image"])).max() > 1e-5
    sess.clear_correspondences()
    assert sess._corr == []
