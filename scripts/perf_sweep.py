"""Sweep-renderer perf harness: times skip modes / block sizes / u_res on the
attached chip with the bench.py volume (R=256, P=6). Not part of the test suite.

Usage: python scripts/perf_sweep.py [mode ...]   e.g. `none slice block block:448`
(mode[:u_res] with mode in {none, slice, block} — the lax.cond skip granularity
of the sweep compositor; u_res overrides the sweep-plane resolution)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import look_at, make_sweep_volume  # noqa: E402


VALID_SKIP = ("none", "slice", "block")


def time_mode(sv, skip, u_res=512, H=800, W=800, n_frames=10):
    import jax.numpy as jnp

    from palettenerf_tpu.render.palette_renderer import make_region_edit
    from palettenerf_tpu.render.sweep import render_sweep

    P = sv.num_basis
    rng = np.random.default_rng(0)
    bc = np.clip(rng.uniform(0, 1, (P, 3)), 0, 1)
    edit = make_region_edit(P, clip_dim=1, mean_xyz=(0.2, 0.0, 0.0), std_xyz=0.4)
    edit = edit._replace(delta_hsv=jnp.asarray(
        [[120.0, 1.0, 1.0], [0.0, 0.6, 1.2]] * (P // 2)))
    intr = (H * 0.9, H * 0.9, W / 2, H / 2)

    def frame(i):
        pose = look_at((2.0 * np.sin(0.4 * i), 0.4, -2.0 * np.cos(0.4 * i)))
        return render_sweep(sv, pose, intr, H, W, u_res=u_res,
                            basis_color=bc, edit=edit, skip=skip)

    out = frame(0)
    _ = float(out["image"].sum())
    out = frame(7)  # other flip variant compiles too
    _ = float(out["image"].sum())
    t0 = time.perf_counter()
    outs = [frame(i + 1) for i in range(n_frames)]
    _ = [float(o["image"][0, 0, 0]) for o in outs]
    dt = (time.perf_counter() - t0) / n_frames
    return dt


def main():
    modes = sys.argv[1:] or ["none", "slice", "block"]
    sv = make_sweep_volume()
    print("volume ready", flush=True)
    for m in modes:
        skip, _, rest = m.partition(":")
        if skip not in VALID_SKIP:
            raise SystemExit(f"unknown skip mode {skip!r}; valid: {VALID_SKIP}")
        u_res = int(rest) if rest else 512
        dt = time_mode(sv, skip, u_res)
        print(f"{m:12s} u{u_res}: {dt * 1e3:7.1f} ms/frame = {1 / dt:6.2f} fps",
              flush=True)


if __name__ == "__main__":
    main()
