"""Slim a training checkpoint for committing as the acceptance artifact.

Two modes:

1. In-place slim (default): keeps params / ema_params / grid_state / epoch /
   global_step (everything the eval, bake, serve, and warm-start paths read)
   and drops the Adam moments + PRNG key (only needed for bit-continuous
   resume), roughly a 3x size cut. Rewrites the newest ``*_ep*.ckpt`` in place
   so every loader keeps working unchanged.

     python scripts/export_deploy_ckpt.py results/proc_toys/version_1 [--dry]

2. ``--deploy_dir DIR``: additionally writes a COMMITTABLE deploy checkpoint:
   EMA weights only (the eval/bake/serve paths read eval_params == ema) with
   the large hash tables cast to bfloat16 (the -O/-O2 profiles already consume
   them as bf16 compute), small tensors kept f32. ~8x smaller than the
   training checkpoint; results*/ are gitignored, so this is how the trained
   product state survives in the repo (the loaders' non-strict merge re-casts
   on load).

     python scripts/export_deploy_ckpt.py results_palette/proc_toys/version_1 \
         --deploy_dir deploy/proc_toys --name palette
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle


def _slim_for_deploy(payload):
    """EMA-only + bf16 big tensors. Returns a new payload dict."""
    import numpy as np

    import jax.numpy as jnp

    params = payload.get("ema_params") or payload["params"]

    def cast(x):
        a = np.asarray(x)
        if a.dtype == np.float32 and a.size > 1 << 16:  # hash tables / big MLPs
            return np.asarray(jnp.asarray(a, jnp.bfloat16))
        return a

    slim = {k: cast(v) for k, v in params.items()}
    out = {"params": slim, "epoch": payload.get("epoch", 0),
           "global_step": payload.get("global_step", 0)}
    if "grid_state" in payload:
        out["grid_state"] = payload["grid_state"]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workspace")
    ap.add_argument("--dry", action="store_true")
    ap.add_argument("--keep_all_epochs", action="store_true",
                    help="slim every rolling ckpt instead of deleting the older ones")
    ap.add_argument("--deploy_dir", default="",
                    help="also write an ema-only bf16 deploy ckpt here (committable)")
    ap.add_argument("--name", default="palette", help="deploy ckpt basename")
    args = ap.parse_args()

    ckpt_dir = os.path.join(args.workspace, "checkpoints")
    cands = sorted(glob.glob(os.path.join(ckpt_dir, "*_ep*.ckpt")))
    if not cands:
        raise SystemExit(f"no epoch checkpoints under {ckpt_dir}")
    targets = cands if args.keep_all_epochs else cands[-1:]
    for old in cands:
        if old not in targets:
            print(f"drop {old} ({os.path.getsize(old)/1e6:.1f} MB)")
            if not args.dry:
                os.remove(old)
    for path in targets:
        with open(path, "rb") as f:
            payload = pickle.load(f)
        before = os.path.getsize(path) / 1e6
        if args.deploy_dir:
            os.makedirs(args.deploy_dir, exist_ok=True)
            dst = os.path.join(args.deploy_dir,
                               f"{args.name}_ep{payload.get('epoch', 0):04d}.ckpt")
            deploy = _slim_for_deploy(payload)
            if not args.dry:
                with open(dst, "wb") as f:
                    pickle.dump(deploy, f)
                print(f"deploy: {dst} ({os.path.getsize(dst)/1e6:.1f} MB, "
                      "ema-only, bf16 big tensors)")
        dropped = [k for k in ("opt_state", "prng_key") if k in payload]
        for k in dropped:
            del payload[k]
        if args.dry:
            print(f"{path}: {before:.1f} MB, would drop {dropped}")
            continue
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        print(f"{path}: {before:.1f} -> {os.path.getsize(path)/1e6:.1f} MB "
              f"(dropped {dropped})")


if __name__ == "__main__":
    main()
