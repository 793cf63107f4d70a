#!/bin/bash
# 30k-iter quality A/B at the reference budget (round-3/4 verdict item):
#   -O2 fast profile vs exact trilinear grads (--fp16 only), same seed/schedule.
# Reference budget: /root/reference/main_nerf.py:25 (iters=30000).
# Run unattended on the chip:  bash scripts/run_ab30k.sh >> /tmp/ab30k.log 2>&1
set -x
cd "$(dirname "$0")/.."

COMMON="data_proc/proc_toys --iters 30000 --bound 1 --scale 0.8 --dt_gamma 0
        --min_near 0.05 --num_rays 4096 --max_steps 512
        --train_samples_per_ray 64 --infer_samples_per_ray 192
        --eval_interval 100"

# O2 arm first (fast: ~63 ms/step -> early signal the script works end-to-end),
# then the exact arm (bf16 cotangents, exact trilinear grads: ~0.5-0.7 s/step).
# Both arms bounded so a wedged tunnel can't hold the chip past round end.
time timeout 7200  python main_nerf.py $COMMON --workspace ab30k_o2 -O2
time timeout 28800 python main_nerf.py $COMMON --workspace ab30k_exact --fp16
