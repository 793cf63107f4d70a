"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md): 800x800 **palette-edited** rendering FPS on the
attached chip, with an ACTIVE RegionEdit (spatial gaussian mask + per-basis hue
shift) — the serving path a PaletteNeRF user actually runs. Rendered by the
shear-warp sweep renderer (render/sweep.py) from the TRAINED proc_toys palette
checkpoint, baked at R=256 with vd_bands=2 view-dep SH (measured 46.6 dB vs the
vd3 bake render — view-dep is negligible on this scene — and vd3's 27 SH
channels halved the frame rate). Intermediate-plane resolution u_res=400 for
the 800px output: the R=256 bake is the detail limit (u400 render measures
47.2 dB against the u448 render, while the sweep-vs-exact gap is 29.4 dB —
README serve-fidelity row — so the resample noise is ~2 orders below the
bake's). ``vs_baseline`` = measured_fps / 30.

Secondary keys: plain NeRF sweep FPS and stage-1 train throughput (scanned fast
path, 4096 rays x 64 samples — the reference's default batch).

Timing uses host readbacks: on the tunneled TPU platform ``block_until_ready``
can return before remote execution completes; ``float(x)`` cannot.
"""

from __future__ import annotations

import json
import time

import numpy as np


def look_at(eye):
    eye = np.asarray(eye, np.float64)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0.0, 1.0, 0.0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    pose = np.eye(4)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = right, down, fwd, eye
    return pose.astype(np.float32)


def make_sweep_volume_ckpt(ws="results_palette/proc_toys/version_1", R=256,
                           vd_bands=2):
    """Bake the committed acceptance-scene checkpoint — the real product path
    (trained field -> bake -> bitfield mask -> sweep volume), so the headline
    fps reflects a real occupancy/statistics distribution, not a synthetic
    sphere. Returns (sweep_volume, basis_color [P,3]) or None if absent."""
    import glob
    import os

    import jax
    import jax.numpy as jnp

    from palettenerf_tpu.models.palette import PaletteSpec
    from palettenerf_tpu.render.baking import bake_palette, mask_with_bitfield
    from palettenerf_tpu.render.sweep import build_sweep_volume
    from palettenerf_tpu.train import checkpoint as ckpt_lib

    cands = sorted(glob.glob(os.path.join(ws, "checkpoints", "*.ckpt")))
    if not cands:
        # committed deploy artifact (results*/ are gitignored; the deploy ckpt
        # is the ema-only bf16 export of the same training state — see
        # scripts/export_deploy_ckpt.py --deploy_dir)
        cands = sorted(glob.glob("deploy/proc_toys/palette_*.ckpt"))
    if not cands:
        return None
    payload = ckpt_lib.load_checkpoint(cands[-1])  # newest epoch (has grid_state)
    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    P = params["basis_color"].shape[0]
    spec = PaletteSpec.build(bound=1.0, num_basis=P)
    baked = bake_palette(params, spec, resolution=R, vd_bands=vd_bands)
    gs = payload.get("grid_state")
    if gs is not None and gs.get("bitfield") is not None:
        baked = mask_with_bitfield(baked, gs)
    bc = np.clip(np.asarray(params["basis_color"]), 0, 1)
    return build_sweep_volume(baked, sigma_thresh=1e-3), bc


def make_sweep_volume(R=256, P=6):
    import jax
    import jax.numpy as jnp

    from palettenerf_tpu.render.baking import BakedVolume
    from palettenerf_tpu.render.sweep import build_sweep_volume

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 4)
        lin = jnp.linspace(-1, 1, R)
        g2 = (lin[:, None, None] ** 2 + lin[None, :, None] ** 2
              + lin[None, None, :] ** 2)
        density = jnp.where(g2 > 0.55, 0.0, 30.0 * jnp.exp(-g2 / 0.18))
        diffuse = jax.random.uniform(ks[0], (R, R, R, 3))
        om = jax.random.uniform(ks[1], (R, R, R, P), minval=0.01)
        om = om / om.sum(-1, keepdims=True)
        off = jax.random.uniform(ks[2], (R, R, R, 3 * P), minval=-0.1, maxval=0.1)
        rad = jax.random.uniform(ks[3], (R, R, R), minval=-0.5, maxval=1.5)
        return density, diffuse, om, off, rad

    density, diffuse, om, off, rad = gen(jax.random.PRNGKey(0))
    baked = BakedVolume(R, 1.0, density, diffuse, om, off, rad)
    return build_sweep_volume(baked)


def bench_palette_edit(sv, H=800, W=800, u_res=400, n_frames=15, reps=4, bc=None):
    import jax.numpy as jnp

    from palettenerf_tpu.render.palette_renderer import make_region_edit
    from palettenerf_tpu.render.sweep import render_sweep

    P = sv.num_basis
    if bc is None:
        rng = np.random.default_rng(0)
        bc = np.clip(rng.uniform(0, 1, (P, 3)), 0, 1)
    edit = make_region_edit(P, clip_dim=1, mean_xyz=(0.2, 0.0, 0.0), std_xyz=0.4)
    dh = ([[120.0, 1.0, 1.0], [0.0, 0.6, 1.2]] * ((P + 1) // 2))[:P]
    edit = edit._replace(delta_hsv=jnp.asarray(dh))
    intr = (H * 0.9, H * 0.9, W / 2, H / 2)

    def frame(i):
        pose = look_at((2.0 * np.sin(0.4 * i), 0.4, -2.0 * np.cos(0.4 * i)))
        return render_sweep(sv, pose, intr, H, W, u_res=u_res,
                            basis_color=bc, edit=edit)

    out = frame(0)
    _ = float(out["image"].sum())  # compile + sync
    out = frame(7)
    _ = float(out["image"].sum())  # second sweep-flip variant compiles too

    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(n_frames):
            out = frame(i + r * n_frames)
        # one scalar readback syncs the whole rep: the chip executes dispatches
        # in order, so the last frame's result completing implies all did. A
        # per-frame readback would add a ~29 ms tunnel round-trip to every frame.
        _ = float(out["image"][0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / n_frames)
    return 1.0 / best


def bench_nerf_sweep(sv_nerf, H=800, W=800, u_res=400, n_frames=10):
    from palettenerf_tpu.render.sweep import render_sweep

    intr = (H * 0.9, H * 0.9, W / 2, H / 2)

    def frame(i):
        pose = look_at((2.0 * np.sin(0.4 * i), 0.4, -2.0 * np.cos(0.4 * i)))
        return render_sweep(sv_nerf, pose, intr, H, W, u_res=u_res)

    out = frame(0)
    _ = float(out["image"].sum())
    t0 = time.perf_counter()
    for i in range(n_frames):
        out = frame(i + 1)
    _ = float(out["image"][0, 0, 0])  # sync once — see bench_palette_edit
    return n_frames / (time.perf_counter() - t0)


def bench_single_basis_edit(sv, bc, H=800, W=800, u_res=400, n_frames=12):
    """Worst-case global recolor is the headline; this measures a SINGLE-basis
    recolor, where the static per-basis HSV restriction (render/sweep.py
    edit_bases) should land near the plain no-edit fps (round-3 verdict #4)."""
    import jax.numpy as jnp

    from palettenerf_tpu.render.palette_renderer import make_region_edit
    from palettenerf_tpu.render.sweep import render_sweep

    P = sv.num_basis
    if bc is None:
        bc = np.clip(np.random.default_rng(0).uniform(0, 1, (P, 3)), 0, 1)
    edit = make_region_edit(P, clip_dim=1)
    dh = np.tile(np.asarray([[0.0, 1.0, 1.0]], np.float32), (P, 1))
    dh[0] = [120.0, 1.0, 1.0]  # only basis 0 recolored
    edit = edit._replace(delta_hsv=jnp.asarray(dh))
    intr = (H * 0.9, H * 0.9, W / 2, H / 2)

    def frame(i):
        pose = look_at((2.0 * np.sin(0.4 * i), 0.4, -2.0 * np.cos(0.4 * i)))
        return render_sweep(sv, pose, intr, H, W, u_res=u_res,
                            basis_color=bc, edit=edit)

    out = frame(0)
    _ = float(out["image"].sum())
    out = frame(7)
    _ = float(out["image"].sum())
    t0 = time.perf_counter()
    for i in range(n_frames):
        out = frame(i + 1)
    _ = float(out["image"][0, 0, 0])
    return n_frames / (time.perf_counter() - t0)


def bench_exact_eval(data_root="data_proc/proc_toys",
                     workspace="results/proc_toys/version_1",
                     compact_frac=0.375, fine_grid=0):
    """Exact per-ray eval path: seconds per 800x800 test frame on the trained
    stage-1 checkpoint with the default compaction-rounds schedule + cross-ray
    sample compaction (round-3 verdict #2 evidence; round-2 measured 82.8 s).
    ``fine_grid > 0`` adds the dt-aware fine eval bitfield (exact-conservative;
    the bake itself runs once and is excluded from the frame timing).

    results*/ are gitignored and the driver benches a fresh clone, so when the
    training workspace is absent this falls back to the committed stage-1
    deploy checkpoint (deploy/proc_toys/nerf_*.ckpt) the same way the sweep
    headline falls back to the palette deploy ckpt."""
    import glob
    import os

    if not os.path.isdir(data_root):
        return None
    use_checkpoint = "latest"
    if not os.path.isdir(workspace):
        cands = sorted(glob.glob("deploy/proc_toys/nerf_*.ckpt"))
        if not cands:
            return None
        use_checkpoint = cands[-1]
        workspace = "/tmp/bench_exact_eval_ws"
    import dataclasses

    from palettenerf_tpu.config import Config
    from palettenerf_tpu.data.provider import NeRFDataset
    from palettenerf_tpu.models.nerf import NeRFSpec
    from palettenerf_tpu.train.trainer import Trainer

    cfg = Config(path=data_root, O=True, fp16=True, cuda_ray=True, preload=True,
                 bound=1.0, scale=0.8, dt_gamma=0.0, min_near=0.05,
                 bg_radius=0, test=True, eval_fine_grid=fine_grid,
                 eval_compact_frac=compact_frac)
    spec = NeRFSpec.build(bound=cfg.bound, bg_radius=cfg.bg_radius, fp16=True,
                          log2_hashmap_size=cfg.log2_hashmap_size,
                          grid_levels=cfg.grid_levels,
                          grid_level_dim=cfg.grid_level_dim)
    tr = Trainer("ngp", cfg, spec, workspace=workspace,
                 use_checkpoint=use_checkpoint, mute=True)
    ds = NeRFDataset(cfg, type="test")
    data = next(iter(ds.iter_epoch()))
    ro = np.asarray(data["rays_o"]).reshape(-1, 3)
    rd = np.asarray(data["rays_d"]).reshape(-1, 3)
    tr.render_image(ro, rd)  # compile + warm (+ fine bake when enabled)
    t0 = time.perf_counter()
    tr.render_image(ro, rd)
    return time.perf_counter() - t0


def bench_train_steps(n_steps=16, num_rays=4096, samples=64, fast: bool = True):
    """Stage-1 scanned train throughput at the reference's default batch size.

    ``fast=True`` measures the recommended TPU profile (-O2: bf16 params,
    PRNG stochastic-trilerp hash forward, bf16 Pallas tile-scatter backward
    over a random 8-level subset, hierarchical occupancy march).
    ``fast=False`` measures exact f32 gradients on the flat march.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from palettenerf_tpu.models.nerf import NeRFSpec, init_nerf
    from palettenerf_tpu.ops.occupancy import packbits
    from palettenerf_tpu.render.nerf_renderer import RenderSettings, render_nerf_train

    spec = NeRFSpec.build(bound=1.0, fp16=fast, fast_grad=fast,
                          stochastic_trilerp=fast, grad_levels=8 if fast else 0)
    params = init_nerf(jax.random.PRNGKey(0), spec)
    G = 128
    r = (2 * (np.arange(G) + 0.5) / G - 1)
    X, Y, Z = np.meshgrid(r, r, r, indexing="ij")
    occ = (X ** 2 + Y ** 2 + Z ** 2) < 0.55
    bitfield = packbits(jnp.asarray(occ.reshape(-1).astype(np.uint8)))
    settings = RenderSettings(bound=1.0, cascade=1, grid_size=G, dt_gamma=0.0,
                              max_steps=512, num_samples=samples, t_thresh=1e-4,
                              min_near=0.2,
                              march_groups=max(16, samples // 4) if fast else 0)
    tx = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = tx.init(params)

    def scan_steps(params, opt_state, key, k_steps):
        def body(carry, _):
            params, opt_state, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            z = jax.random.normal(k1, (num_rays, 3)) * 0.1 + jnp.asarray([0, 0, 1.0])
            rd = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
            ro = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.5]), (num_rays, 3))
            gt = jax.random.uniform(k2, (num_rays, 3))

            def loss_fn(p):
                out = render_nerf_train(p, spec, bitfield, ro, rd, k2, settings,
                                        bg_color=jnp.ones(3), rays_gt=gt, perturb=True)
                return ((out["image"] - gt) ** 2).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), None, length=k_steps)
        return params, opt_state, losses

    fn = jax.jit(scan_steps, static_argnums=(3,), donate_argnums=(0, 1))
    # warm up with the SAME k_steps — a different scan length is a different
    # static arg and would put a recompile inside the timed region
    params, opt_state, losses = fn(params, opt_state, jax.random.PRNGKey(1), n_steps)
    _ = float(losses.sum())  # compile + sync
    t0 = time.perf_counter()
    params, opt_state, losses = fn(params, opt_state, jax.random.PRNGKey(2), n_steps)
    _ = float(losses[-1])
    return n_steps / (time.perf_counter() - t0)


def _log(msg):
    import sys
    print(f"[bench +{time.perf_counter() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def _arm_device_watchdog(timeout=600):
    """The tunneled TPU backend can wedge (device init hangs in
    make_c_api_client, observed multi-hour outages). Emit an explicit error
    line instead of hanging until the driver's timeout."""
    import os
    import threading

    devices_up = threading.Event()

    def _watchdog():
        if not devices_up.wait(timeout):
            print(json.dumps({"error": "TPU device init timed out (tunnel down)"}),
                  flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    n_dev = len(jax.devices())
    devices_up.set()
    _log(f"devices up: {n_dev}")


def sub_sweep():
    """Headline + the two sweep variants. These three share the (expensive)
    checkpoint bake, so they run in one process; the train/eval benches run in
    their own subprocesses (see main) so the multi-GB sweep volumes can never
    contaminate their timings — in round 4 leftover sweep HBM state slowed the
    scanned train bench 11x (686 ms/step recorded vs 63 ms in isolation)."""
    result = {}
    bc = None
    sv = None
    try:
        loaded = make_sweep_volume_ckpt()
        if loaded is not None:
            sv, bc = loaded
            result["volume_source"] = "trained_checkpoint(proc_toys/version_1)"
            _log("acceptance checkpoint baked")
    except Exception as e:  # fall back to synthetic, but say so
        result["volume_source"] = f"synthetic (ckpt bake failed: {str(e)[:80]})"
    if sv is None:
        sv = make_sweep_volume()
        result.setdefault("volume_source", "synthetic (no checkpoint present)")
        _log("palette volume baked (synthetic)")
    fps = bench_palette_edit(sv, bc=bc)
    _log(f"palette fps {fps:.2f}")
    result["value"] = round(fps, 3)
    result["vs_baseline"] = round(fps / 30.0, 4)
    result["rays_per_sec"] = round(800 * 800 * fps)

    try:
        result["single_basis_edit_fps"] = round(
            bench_single_basis_edit(sv, bc), 3)
        _log("single-basis edit bench done")
    except Exception as e:  # secondary metric must not kill the headline
        result["single_basis_edit_error"] = str(e)[:120]

    def _nerf_sweep(sv):
        from palettenerf_tpu.render.baking import BakedVolume
        from palettenerf_tpu.render.sweep import build_sweep_volume
        import jax.numpy as jnp
        R = sv.resolution
        # reuse density from the palette volume's first axis copy (channel 0),
        # then FREE the palette volume — the nerf sweep is latency-bound and
        # measures ~45% slower with the palette volume still resident in HBM
        # (round-5 probes: 63 fps clean vs 43 contaminated)
        dens = jnp.asarray(sv.vols[0][:, :, 0, :], jnp.float32)  # [Z,X,C,Y] ch 0
        for v in sv.vols:
            v.delete()
        baked_n = BakedVolume(R, 1.0, dens, jnp.zeros((R, R, R, 3)) + 0.5,
                              None, None, None)
        svn = build_sweep_volume(baked_n)
        dens.delete()
        return bench_nerf_sweep(svn)

    try:
        result["nerf_sweep_fps"] = round(_nerf_sweep(sv), 3)
        _log("nerf sweep done")
    except Exception as e:
        result["nerf_sweep_error"] = str(e)[:120]
    del sv
    return result


def sub_train():
    return {"train_steps_per_sec": round(bench_train_steps(), 3)}


def sub_train_exact():
    return {"train_steps_per_sec_exact": round(
        bench_train_steps(n_steps=6, fast=False), 3)}


def sub_exact_eval():
    s = bench_exact_eval()
    return {} if s is None else {"exact_eval_s_per_frame": round(s, 3)}


def sub_exact_eval_fine():
    # dt-aware fine-grid culling (exact-conservative): the round-5 exact-eval
    # lever. compact_frac shrinks with the valid-sample fraction.
    s = bench_exact_eval(compact_frac=0.125, fine_grid=256)
    return {} if s is None else {"exact_eval_fine_s_per_frame": round(s, 3)}


# name -> (fn, wall-clock budget seconds). Budgets are generous: device init
# can take minutes through the tunnel and first compiles are 1-3 min.
_SUBS = {
    "sweep": (sub_sweep, 2400),
    "train": (sub_train, 900),
    "train_exact": (sub_train_exact, 1200),
    "exact_eval": (sub_exact_eval, 1500),
    "exact_eval_fine": (sub_exact_eval_fine, 1500),
}


def main():
    import os
    import subprocess
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--sub":
        # child mode: run ONE sub-bench group and print its JSON fragment.
        _arm_device_watchdog()
        print(json.dumps(_SUBS[sys.argv[2]][0]()), flush=True)
        return

    # Parent mode: orchestrate each sub-bench group in its OWN subprocess so
    # HBM allocations / compile state from one group cannot contaminate the
    # next (round-4 finding: the driver-recorded train_steps_per_sec was 11x
    # below the isolated number). The parent never imports jax, so the device
    # is free for each child in turn.
    result = {"metric": "palette_edit_render_800x800", "value": 0.0, "unit": "fps",
              "vs_baseline": 0.0}
    here = os.path.abspath(__file__)
    for name, (_, budget) in _SUBS.items():
        try:
            proc = subprocess.run(
                [sys.executable, here, "--sub", name],
                stdout=subprocess.PIPE, stderr=sys.stderr,
                cwd=os.path.dirname(here), timeout=budget)
            lines = [l for l in proc.stdout.decode().splitlines() if l.strip()]
            if proc.returncode != 0 or not lines:
                result[f"{name}_error"] = (
                    f"rc={proc.returncode} out={lines[-1][:80] if lines else ''}")
                continue
            frag = json.loads(lines[-1])
            if "error" in frag:
                result[f"{name}_error"] = frag.pop("error")
            result.update(frag)
            _log(f"sub-bench {name} merged")
        except subprocess.TimeoutExpired:
            result[f"{name}_error"] = f"timed out after {budget}s"
        except Exception as e:
            result[f"{name}_error"] = str(e)[:120]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
