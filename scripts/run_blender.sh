#!/bin/bash
# Blender-scene dispatch, mirroring reference scripts/run_blender.sh:
#   run_blender.sh <configfile> -m {nerf|extract|palette} [-t] [-v] [-g]
# Per-scene variables come from scripts/configs_blender/<scene>.sh.
CONFIGFILE=$1
shift

if [ -z "$CONFIGFILE" ]; then
    echo "Error: a config file is required."
    exit 1
fi
if [ ! -f "$CONFIGFILE" ]; then
    echo "Error: $CONFIGFILE does not exist."
    exit 1
fi
source "$CONFIGFILE"

# EXTRA_FLAGS: optional passthrough, e.g. the validated TPU fast profile:
#   EXTRA_FLAGS="--fast_grad" bash scripts/run_blender.sh configs_blender/lego.sh -m nerf
# (-O already enables fp16/bf16; --fast_grad adds the nearest-corner hash
#  backward, ~6x faster steps, quality-neutral on the acceptance A/B)

while [[ $# -gt 0 ]]; do
  case $1 in
    -t|--test)  test=True;  shift ;;
    -v|--video) video=True; shift ;;
    -g|--gui)   gui=True;   shift ;;
    -m|--model) model="$2"; shift; shift ;;
    *) shift ;;
  esac
done

if [ $gui ]; then
    test_mode='--test --gui'
elif [ $video ]; then
    test_mode='--test --video'
elif [ $test ]; then
    test_mode='--test'
else
    test_mode=''
fi

if [[ $model == 'nerf' ]]; then
    python main_nerf.py \
    $data_dir \
    --workspace ${name} \
    --iters ${iters} \
    --bound ${bound} \
    --offset ${offset} \
    --scale ${scale} \
    --bg_radius ${bg_radius} \
    --density_thresh ${density_thresh} \
    -O \
    --dt_gamma 0 \
    $test_mode \
    ${EXTRA_FLAGS}
elif [[ $model == 'extract' ]]; then
    python main_palette.py \
    $data_dir \
    $nerf_model \
    -O \
    --bound ${bound} \
    --scale ${scale} \
    --bg_radius ${bg_radius} \
    --density_thresh ${density_thresh} \
    --extract_palette \
    --use_normalized_palette
elif [[ $model == 'palette' ]]; then
    python main_palette.py \
    $data_dir \
    $nerf_model \
    -O \
    --iters ${iters} \
    --bound ${bound} \
    --scale ${scale} \
    --offset ${offset} \
    --bg_radius ${bg_radius} \
    --density_thresh ${density_thresh} \
    --random_size ${random_size} \
    --use_initialization_from_rgbxy \
    --use_normalized_palette \
    --dt_gamma 0 \
    --datatype "blender" \
    $test_mode \
    ${EXTRA_FLAGS}
else
    echo "Invalid model. Options are: nerf, extract, palette"
fi
