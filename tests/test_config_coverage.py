"""Coverage of the reference's non-default configurations: multi-cascade scenes
(bound > 1 with dt_gamma > 0), background sphere model, LSeg/pred_clip palette mode,
and error-map ray sampling."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palettenerf_tpu.config import Config


def test_multicascade_march_levels():
    """bound=4 scene: cascade=3, mip levels must track |x| and dt (raymarching.cu:45-57)."""
    from palettenerf_tpu.ops.march import march_rays, mip_level
    from palettenerf_tpu.ops.occupancy import packbits

    H, bound, cascade = 64, 4.0, 3
    bf = packbits(jnp.ones((cascade * H ** 3,), jnp.uint8))
    # ray crossing the whole scene diagonally-ish
    o = jnp.asarray([[-3.5, 0.1, 0.1]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    near, far = jnp.asarray([0.2]), jnp.asarray([7.5])
    res = march_rays(o, d, near, far, bf, bound, cascade, H, 1 / 128, 512, 448, None)
    n = int(res.mask.sum())
    assert n > 128
    xs = np.asarray(res.xyzs[0, :n, 0])
    assert xs.min() < -3.0 and xs.max() > 1.0  # crosses cascade boundaries
    # dt grows along the ray under dt_gamma (adaptive stepping)
    dts = np.asarray(res.dts[0, :n])
    assert dts[-1] > 2 * dts[0]
    # mip level increases away from the origin
    lv_in = mip_level(jnp.asarray([[0.4, 0, 0]]), jnp.asarray([1e-3]), H, cascade)
    lv_out = mip_level(jnp.asarray([[3.5, 0, 0]]), jnp.asarray([1e-3]), H, cascade)
    assert int(lv_in[0]) == 0 and int(lv_out[0]) == 2


def test_background_sphere_model():
    from palettenerf_tpu.models.nerf import NeRFSpec, init_nerf
    from palettenerf_tpu.ops.occupancy import packbits
    from palettenerf_tpu.render.nerf_renderer import RenderSettings, render_nerf_eval

    spec = NeRFSpec.build(bound=1.0, bg_radius=8.0, grid_levels=4, log2_hashmap_size=14)
    params = init_nerf(jax.random.PRNGKey(0), spec)
    assert "encoder_bg" in params and "bg_net" in params
    bf = packbits(jnp.zeros((128 ** 3,), jnp.uint8))  # fully empty -> pure background
    settings = RenderSettings(bound=1.0, cascade=1, grid_size=128, max_steps=32,
                              num_samples=8, min_near=0.05, bg_radius=8.0)
    ro = jnp.tile(jnp.asarray([[0, 0, -1.5]], jnp.float32), (8, 1))
    rd = jnp.tile(jnp.asarray([[0, 0, 1.0]], jnp.float32), (8, 1))
    out = jax.jit(lambda p: render_nerf_eval(p, spec, bf, ro, rd, settings))(params)
    img = np.asarray(out["image"])
    assert np.isfinite(img).all()
    assert not np.allclose(img, 1.0)  # background net, not the white default


def _write_scene_with_lseg(root, clip_dim=8, n=3, H=16, W=16):
    import sys

    sys.path.insert(0, "tests")
    from synthetic import make_sphere_dataset

    make_sphere_dataset(root, n_train=n, n_val=1, n_test=1, H=H, W=W)
    feat_dir = os.path.join(root, "lseg_feature")
    os.makedirs(feat_dir, exist_ok=True)
    with open(os.path.join(root, "transforms_train.json")) as f:
        frames = json.load(f)["frames"]
    rng = np.random.default_rng(0)
    for fr in frames:
        base = os.path.splitext(os.path.basename(fr["file_path"]))[0]
        np.save(os.path.join(feat_dir, base + ".npy"),
                rng.normal(size=(H, W, clip_dim)).astype(np.float32))


def test_lseg_palette_dataset_and_pred_clip_step(tmp_path):
    """palette_lseg mode: feature maps load, collate gathers per-ray features, and the
    pred_clip train step runs with the clip loss."""
    from palettenerf_tpu.data.palette_provider import PaletteDataset
    from palettenerf_tpu.models.palette import PaletteSpec
    from palettenerf_tpu.train.palette_trainer import PaletteTrainer

    root = str(tmp_path / "scene")
    _write_scene_with_lseg(root, clip_dim=8)
    cfg = Config(path=root, bound=1.0, scale=0.5, dt_gamma=0.0, min_near=0.05,
                 num_rays=64, iters=4, max_steps=32, grid_size=64,
                 train_samples_per_ray=8, infer_samples_per_ray=16,
                 pred_clip=True, clip_dim=8, num_basis=4, seed=0,
                 update_extra_interval=2, grid_levels=4, log2_hashmap_size=13)
    ds = PaletteDataset(cfg, type="train")
    assert ds.feat_images is not None and ds.feat_images.shape[-1] == 8
    batch = ds.collate(0)
    assert batch["feat_images"].shape == (64, 8)

    spec = PaletteSpec.build(bound=1.0, num_basis=4, pred_clip=True, clip_dim=8,
                             grid_levels=4, log2_hashmap_size=13)
    tr = PaletteTrainer("palette", cfg, spec, workspace=str(tmp_path / "ws"),
                        use_checkpoint="scratch", nerf_path=None, mute=True)
    assert "clip_net" in tr.params
    tr.train(ds, None, 1)
    assert np.isfinite(tr.stats["loss"][-1])


def test_error_map_sampling_and_update(tmp_path):
    """error_map mode: multinomial coarse sampling + EMA update (nerf/utils.py:115-127,
    556-578) through the provider's slow path."""
    import sys

    sys.path.insert(0, "tests")
    from synthetic import make_sphere_dataset

    from palettenerf_tpu.data.provider import NeRFDataset

    root = str(tmp_path / "scene")
    make_sphere_dataset(root, n_train=3, n_val=1, n_test=1, H=16, W=16)
    cfg = Config(path=root, bound=1.0, scale=0.5, num_rays=64, error_map=True, seed=0)
    ds = NeRFDataset(cfg, type="train")
    assert ds.error_map is not None and ds.error_map.shape == (3, 128 * 128)
    b = ds.collate(0)
    assert "inds_coarse" in b and b["inds_coarse"].shape == (64,)
    before = ds.error_map[0].copy()
    ds.update_error_map(0, b["inds_coarse"], np.full(64, 5.0, np.float32))
    after = ds.error_map[0]
    assert (after[b["inds_coarse"]] > before[b["inds_coarse"]]).all()
    assert np.allclose(np.delete(after, b["inds_coarse"]),
                       np.delete(before, b["inds_coarse"]))


def test_patch_smooth_loss_path(tmp_path):
    """random_size paired sampling + lambda_patchsmooth term (palette/utils.py:494-516)."""
    import sys

    sys.path.insert(0, "tests")
    from synthetic import make_sphere_dataset

    from palettenerf_tpu.data.palette_provider import PaletteDataset
    from palettenerf_tpu.models.palette import PaletteSpec
    from palettenerf_tpu.train.palette_trainer import PaletteTrainer

    root = str(tmp_path / "scene")
    make_sphere_dataset(root, n_train=3, n_val=1, n_test=1, H=16, W=16)
    cfg = Config(path=root, bound=1.0, scale=0.5, dt_gamma=0.0, min_near=0.05,
                 num_rays=64, iters=3, max_steps=32, grid_size=64,
                 train_samples_per_ray=8, infer_samples_per_ray=16,
                 num_basis=4, seed=0, random_size=2, lambda_patchsmooth=0.1,
                 smooth_loss_start_epoch=0, update_extra_interval=2,
                 grid_levels=4, log2_hashmap_size=13)
    ds = PaletteDataset(cfg, type="train")
    b = ds.collate(0)
    # paired sampling: second half are jittered copies of the first half's pixels
    ij = np.stack([b["inds"] // 16, b["inds"] % 16], -1)
    assert (np.abs(ij[:32] - ij[32:]) <= 2).all()

    spec = PaletteSpec.build(bound=1.0, num_basis=4, grid_levels=4, log2_hashmap_size=13)
    tr = PaletteTrainer("palette", cfg, spec, workspace=str(tmp_path / "ws"),
                        use_checkpoint="scratch", nerf_path=None, mute=True)
    tr.require_smooth_loss = True
    assert not tr.supports_fast_path(ds)  # random_size forces the paired slow path
    tr.train_one_epoch(ds)
    assert np.isfinite(tr.stats["loss"][-1])
