"""Metric meters: PSNR/SSIM golden values, rLPIPS perceptual ordering, LPIPS
degradation behavior without the pretrained package."""

import numpy as np
import pytest

from palettenerf_tpu.train.metrics import (
    LPIPSMeter, PSNRMeter, RLPIPSMeter, SSIMMeter, psnr, ssim,
)


def _img(seed=0, H=64, W=64):
    rng = np.random.default_rng(seed)
    # smooth-ish natural-image stand-in: blurred noise
    x = rng.uniform(0, 1, (H + 8, W + 8, 3))
    k = np.ones((5, 5)) / 25.0
    from scipy.signal import convolve2d
    x = np.stack([convolve2d(x[..., c], k, mode="valid") for c in range(3)], -1)
    return np.clip(x[:H, :W], 0, 1).astype(np.float32)


def test_psnr_golden():
    a = np.zeros((8, 8, 3), np.float32)
    b = np.full((8, 8, 3), 0.1, np.float32)
    assert abs(psnr(a, b) - 20.0) < 1e-3


def test_ssim_identity_and_degradation():
    x = _img(0)
    assert ssim(x, x) > 0.999
    noisy = np.clip(x + np.random.default_rng(1).normal(0, 0.1, x.shape), 0, 1)
    assert ssim(x, noisy.astype(np.float32)) < 0.95


def test_rlpips_zero_on_identity_and_monotone():
    m = RLPIPSMeter()
    x = _img(0)
    m.update(x, x)
    assert m.measure() < 1e-5

    rng = np.random.default_rng(1)
    small = np.clip(x + rng.normal(0, 0.02, x.shape), 0, 1).astype(np.float32)
    big = np.clip(x + rng.normal(0, 0.2, x.shape), 0, 1).astype(np.float32)
    m1 = RLPIPSMeter(); m1.update(x, small)
    m2 = RLPIPSMeter(); m2.update(x, big)
    assert 0 < m1.measure() < m2.measure()


def test_rlpips_deterministic_across_instances():
    """Fixed seed -> two meter instances must agree exactly (scores are only
    meaningful relative to other runs of the same fixed-weight stack)."""
    x = _img(2)
    y = _img(3)
    m1 = RLPIPSMeter(); m1.update(x, y)
    m2 = RLPIPSMeter(); m2.update(x, y)
    assert m1.measure() == m2.measure()


def test_lpips_unavailable_reports_nan_without_hack():
    m = LPIPSMeter()
    if m._fn is not None:
        pytest.skip("lpips actually installed")
    m.update(np.zeros((1, 8, 8, 3)), np.zeros((1, 8, 8, 3)))
    assert np.isnan(m.measure())
    assert m.N == 0  # no phantom sample counting


def test_meter_accumulation():
    m = PSNRMeter()
    a = np.zeros((8, 8, 3)); b = np.full((8, 8, 3), 0.1)
    m.update(a, b); m.update(a, b)
    assert m.N == 2 and abs(m.measure() - 20.0) < 1e-3
    m.clear()
    assert m.N == 0


def test_ssim_meter_batched():
    m = SSIMMeter()
    x = _img(4)
    m.update(np.stack([x, x]), np.stack([x, x]))
    assert m.N == 2 and m.measure() > 0.999


def test_rlpips_patch_loss_trains(tmp_path):
    """lambda_lpips patch loss: differentiable, finite grads, runs through the
    trainer's patch path (reference nerf/utils.py:542-550)."""
    import jax
    import jax.numpy as jnp

    from palettenerf_tpu.train.metrics import make_rlpips_kernels, rlpips_distance

    kernels = make_rlpips_kernels()
    key = jax.random.PRNGKey(0)
    gt = jax.random.uniform(key, (2, 16, 16, 3))

    def loss(x):
        return rlpips_distance(kernels, x, gt)

    x = jnp.clip(gt + 0.1, 0, 1)
    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
    # one gradient step reduces the distance
    x2 = x - 2.0 * g
    assert float(loss(x2)) < float(loss(x))


def test_trainer_patch_lpips_step(tmp_path):
    """NeRF trainer with patch sampling + lambda_lpips runs and yields finite loss."""
    import sys

    sys.path.insert(0, "tests")
    from synthetic import make_sphere_dataset

    from palettenerf_tpu.config import Config
    from palettenerf_tpu.data.provider import NeRFDataset
    from palettenerf_tpu.models.nerf import NeRFSpec
    from palettenerf_tpu.train.trainer import Trainer

    root = str(tmp_path / "scene")
    make_sphere_dataset(root, n_train=3, n_val=1, n_test=1, H=16, W=16)
    cfg = Config(path=root, bound=1.0, scale=0.5, num_rays=64, iters=4,
                 max_steps=32, grid_size=64, train_samples_per_ray=8,
                 infer_samples_per_ray=16, seed=0, update_extra_interval=2,
                 grid_levels=4, log2_hashmap_size=13,
                 patch_size=4, lambda_lpips=0.1)
    spec = NeRFSpec.build(bound=1.0, grid_levels=4, log2_hashmap_size=13)
    tr = Trainer("ngp", cfg, spec, workspace=str(tmp_path / "ws"),
                 use_checkpoint="scratch", mute=True)
    ds = NeRFDataset(cfg, type="train")
    tr.train(ds, None, 1)
    assert np.isfinite(tr.stats["loss"][-1])
