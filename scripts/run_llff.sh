#!/bin/bash
# LLFF-scene dispatch, mirroring reference scripts/run_llff.sh:
#   run_llff.sh <configfile> -m {nerf|extract|palette} [-t] [-v] [-g]
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
    --lambda_sparse ${lambda_sparse} \
    --min_near ${min_near} \
    --no_bg \
    -O \
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
    --min_near ${min_near} \
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
    --min_near ${min_near} \
    --random_size ${random_size} \
    --use_initialization_from_rgbxy \
    --use_normalized_palette \
    --datatype "llff" \
    $test_mode \
    ${EXTRA_FLAGS}
else
    echo "Invalid model. Options are: nerf, extract, palette"
fi
