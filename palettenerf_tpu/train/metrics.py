"""Evaluation metrics: PSNR, SSIM, LPIPS (+ palette Sparsity/TV meters).

Meter API mirrors the reference (``nerf/utils.py:220-330``): ``clear`` / ``update`` /
``measure`` / ``report`` / ``write``. PSNR and SSIM are NumPy; SSIM follows the standard
Wang et al. windowed formulation (11x11 Gaussian, sigma 1.5, K1/K2 = 0.01/0.03), i.e.
the value kornia's ``ssim_loss`` maps through ``1 - 2*dssim`` in the reference
(nerf/utils.py:317-318). LPIPS requires the (unavailable here) pretrained ``lpips``
package — it degrades to a NaN report instead of crashing.

Palette-stage meters (``palette/utils.py:52-114``): SparsityMeter = mean over foreground
pixels of L1/L2 ratio of per-pixel basis weights; TVMeter = total variation of the basis
accumulation maps x100. Both carry ``basis_metric = True`` so eval feeds them
``basis_acc`` (palette/utils.py:826-828).
"""

from __future__ import annotations

import os

import numpy as np


def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(-10.0 * np.log10(np.mean((pred - gt) ** 2) + 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size) - size // 2
    k = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    k /= k.sum()
    return np.outer(k, k)


def ssim(pred: np.ndarray, gt: np.ndarray, window_size: int = 11) -> float:
    """pred/gt [H, W, C] in [0,1]; mean SSIM over channels (valid padding)."""
    from scipy.signal import fftconvolve

    k = _gaussian_kernel(window_size)
    c1, c2 = 0.01 ** 2, 0.03 ** 2

    def filt(x):
        return np.stack(
            [fftconvolve(x[..., c], k, mode="valid") for c in range(x.shape[-1])], -1
        )

    mu_p, mu_g = filt(pred), filt(gt)
    mu_p2, mu_g2, mu_pg = mu_p ** 2, mu_g ** 2, mu_p * mu_g
    s_p = filt(pred ** 2) - mu_p2
    s_g = filt(gt ** 2) - mu_g2
    s_pg = filt(pred * gt) - mu_pg
    m = ((2 * mu_pg + c1) * (2 * s_pg + c2)) / ((mu_p2 + mu_g2 + c1) * (s_p + s_g + c2))
    return float(m.mean())


class _MeterBase:
    basis_metric = False

    def __init__(self):
        self.V = 0.0
        self.N = 0

    def clear(self):
        self.V, self.N = 0.0, 0

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def write(self, writer, global_step, prefix=""):
        if writer is not None:
            writer.add_scalar(os.path.join(prefix, self.name), self.measure(), global_step)


class PSNRMeter(_MeterBase):
    name = "PSNR"

    def update(self, preds, truths):
        self.V += psnr(np.asarray(preds), np.asarray(truths))
        self.N += 1

    def report(self):
        return f"PSNR = {self.measure():.6f}"


class SSIMMeter(_MeterBase):
    name = "SSIM"

    def update(self, preds, truths):
        p, t = np.asarray(preds), np.asarray(truths)
        if p.ndim == 4:  # [B, H, W, C]
            for i in range(p.shape[0]):
                self.V += ssim(p[i], t[i])
                self.N += 1
        else:
            self.V += ssim(p, t)
            self.N += 1

    def report(self):
        return f"SSIM = {self.measure():.6f}"


class LPIPSMeter(_MeterBase):
    """Perceptual metric; needs the pretrained ``lpips`` torch package (absent in this
    environment) — reports NaN when unavailable rather than crashing."""

    def __init__(self, net: str = "alex"):
        super().__init__()
        self.net = net
        self.name = f"LPIPS ({net})"
        try:
            import lpips  # noqa: F401
            import torch

            self._fn = lpips.LPIPS(net=net).eval()
            self._torch = torch
        except Exception:
            self._fn = None

    def update(self, preds, truths):
        if self._fn is None:
            return  # measure() reports nan below
        t = self._torch
        p = t.from_numpy(np.asarray(preds)).permute(0, 3, 1, 2).float()
        g = t.from_numpy(np.asarray(truths)).permute(0, 3, 1, 2).float()
        with t.no_grad():
            self.V += float(self._fn(g, p, normalize=True).item())
        self.N += 1

    def measure(self):
        if self._fn is None or self.N == 0:
            return float("nan")
        return super().measure()

    def report(self):
        return f"LPIPS ({self.net}) = {self.measure():.6f}"


# AlexNet-shaped random feature pyramid: (out_channels, kernel, stride)
_RLPIPS_TOPOLOGY = ((64, 11, 4), (192, 5, 2), (384, 3, 2), (256, 3, 2), (256, 3, 2))


def make_rlpips_kernels(seed: int = 0):
    """Deterministic He-init conv stack for the random-feature perceptual
    distance (shared by RLPIPSMeter and the differentiable train-time patch
    loss, reference nerf/utils.py:542-550)."""
    import jax

    key = jax.random.PRNGKey(seed)
    kernels = []
    c_in = 3
    for c_out, k, _s in _RLPIPS_TOPOLOGY:
        key, sub, sub_b = jax.random.split(key, 3)
        w = jax.random.normal(sub, (c_out, c_in, k, k)) * np.sqrt(2.0 / (c_in * k * k))
        # random biases make the stack AFFINE: a bias-free ReLU conv stack is
        # positively homogeneous in its input, so the per-pixel channel-unit
        # normalization in rlpips_distance cancels global contrast changes
        # exactly (measured rho = -0.65 noise on the contrast family in
        # docs/rlpips_validation.md before this term; +1.0 after)
        b = jax.random.normal(sub_b, (c_out,)) * 0.2
        kernels.append((w, b))
        c_in = c_out
    return kernels


def rlpips_distance(kernels, p, g):
    """Differentiable random-feature perceptual distance. p/g [B, H, W, 3] in
    [0,1] -> scalar (LPIPS recipe over the random stack; jit/grad friendly)."""
    import jax
    import jax.numpy as jnp

    def feats(x):
        h = jnp.moveaxis(x, -1, 1) * 2.0 - 1.0        # NCHW in [-1, 1]
        out = []
        for (w, b), (_c, _k, s) in zip(kernels, _RLPIPS_TOPOLOGY):
            h = jax.lax.conv_general_dilated(h, w, (s, s), "SAME")
            h = jax.nn.relu(h + b[None, :, None, None])
            out.append(h)
        return out

    total = 0.0
    for fp, fg in zip(feats(p), feats(g)):
        fp = fp / (jnp.linalg.norm(fp, axis=1, keepdims=True) + 1e-10)
        fg = fg / (jnp.linalg.norm(fg, axis=1, keepdims=True) + 1e-10)
        total = total + ((fp - fg) ** 2).sum(1).mean((-2, -1))
    return total.mean()


class RLPIPSMeter(_MeterBase):
    """Self-contained perceptual distance with RANDOM (deterministic-seed) conv
    features — the LPIPS recipe (unit-normalize each conv stage's channels, L2
    difference, average spatially, sum stages) over an AlexNet-shaped random
    stack instead of pretrained weights — no checkpoint needs to ship with the
    image. Random-feature perceptual distances correlate with human judgments
    substantially better than chance (Amir & Weiss 2021, "Understanding and
    Simplifying Perceptual Distances"), but this is a PROXY: scores are not
    comparable to true LPIPS numbers, only across runs of this meter (seed 0).

    Replaces the reference's ``LPIPSMeter(net='alex')`` (nerf/utils.py:256-290)
    when the ``lpips`` package / weights are unavailable.
    """

    name = "rLPIPS"

    def __init__(self, seed: int = 0):
        super().__init__()
        import jax

        self._kernels = make_rlpips_kernels(seed)
        self._dist = jax.jit(lambda p, g: rlpips_distance(self._kernels, p, g))

    def update(self, preds, truths):
        p = np.asarray(preds, np.float32)
        g = np.asarray(truths, np.float32)
        if p.ndim == 3:
            p, g = p[None], g[None]
        self.V += float(self._dist(p, g))
        self.N += 1

    def report(self):
        return f"rLPIPS = {self.measure():.6f}"


class SparsityMeter(_MeterBase):
    """Mean L1/L2 sparsity of per-pixel palette weights over foreground pixels
    (palette/utils.py:52-81)."""

    name = "Sparsity"
    basis_metric = True

    def update(self, basis_acc, weights_sum=None):
        w = np.asarray(basis_acc)  # [..., P]
        w = w.reshape(-1, w.shape[-1])
        if weights_sum is not None:
            fg = np.asarray(weights_sum).reshape(-1) > 0.5
            w = w[fg]
        if w.size == 0:
            return
        l1 = np.abs(w).sum(-1)
        l2 = np.sqrt((w ** 2).sum(-1)) + 1e-6
        self.V += float((l1 / l2).mean())
        self.N += 1

    def report(self):
        return f"Sparsity = {self.measure():.6f}"


class TVMeter(_MeterBase):
    """Total variation of basis accumulation maps x100 (palette/utils.py:83-114)."""

    name = "TV"
    basis_metric = True

    def update(self, basis_acc, weights_sum=None):
        w = np.asarray(basis_acc)  # [H, W, P] or [B, H, W, P]
        if w.ndim == 3:
            w = w[None]
        tv = (
            np.abs(np.diff(w, axis=1)).mean() + np.abs(np.diff(w, axis=2)).mean()
        )
        self.V += float(tv * 100.0)
        self.N += 1

    def report(self):
        return f"TV = {self.measure():.6f}"
