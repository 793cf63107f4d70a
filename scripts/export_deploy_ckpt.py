"""Slim a training checkpoint for committing as the acceptance artifact.

Keeps params / ema_params / grid_state / epoch / global_step (everything the
eval, bake, serve, and warm-start paths read) and drops the Adam moments +
PRNG key (only needed for bit-continuous resume), roughly a 3x size cut.
Rewrites the newest ``*_ep*.ckpt`` in place by default so every loader keeps
working unchanged.

  python scripts/export_deploy_ckpt.py results/proc_toys/version_1 [--dry]
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workspace")
    ap.add_argument("--dry", action="store_true")
    ap.add_argument("--keep_all_epochs", action="store_true",
                    help="slim every rolling ckpt instead of deleting the older ones")
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
