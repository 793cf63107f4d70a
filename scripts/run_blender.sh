#!/bin/bash
# Blender-scene dispatch mirroring the reference scripts/run_blender.sh:
#   run_blender.sh <scene> -m {nerf|extract|palette} [-t] [-v]
# Per-scene variables come from scripts/configs_blender/<scene>.sh.
set -e

SCENE=""
MODE="nerf"
TEST=0
VIDEO=0
while getopts "s:m:tv" opt 2>/dev/null; do
  case $opt in
    s) SCENE=$OPTARG ;;
    m) MODE=$OPTARG ;;
    t) TEST=1 ;;
    v) VIDEO=1 ;;
  esac
done
shift $((OPTIND-1))
[ -z "$SCENE" ] && SCENE=${1:-lego}

CONFIG="$(dirname "$0")/configs_blender/${SCENE}.sh"
[ -f "$CONFIG" ] && source "$CONFIG"

# defaults (overridable by the config file)
bound=${bound:-1}
scale=${scale:-0.8}
density_thresh=${density_thresh:-10}
iters=${iters:-30000}
min_near=${min_near:-0.2}
data_dir=${data_dir:-data/nerf_synthetic/$SCENE}
nerf_model=${nerf_model:-results/$SCENE}

COMMON="--bound $bound --scale $scale --dt_gamma 0 --density_thresh $density_thresh --min_near $min_near -O --fast_grad"

case $MODE in
  nerf)
    FLAGS="$COMMON --iters $iters --workspace $SCENE"
    [ $TEST -eq 1 ] && FLAGS="$FLAGS --test"
    python main_nerf.py "$data_dir" $FLAGS
    ;;
  extract)
    python main_palette.py "$data_dir" "$nerf_model" --extract_palette \
        --use_normalized_palette $COMMON
    ;;
  palette)
    FLAGS="$COMMON --iters $iters --use_initialization_from_rgbxy --use_normalized_palette"
    [ $TEST -eq 1 ] && FLAGS="$FLAGS --test"
    [ $VIDEO -eq 1 ] && FLAGS="$FLAGS --test --video"
    python main_palette.py "$data_dir" "$nerf_model" $FLAGS
    ;;
  *)
    echo "unknown mode: $MODE (nerf|extract|palette)"; exit 1 ;;
esac
