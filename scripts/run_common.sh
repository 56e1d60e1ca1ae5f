#!/bin/bash
# Shared run logic for run_{llff,mip360,nerf_synthetic}.sh
# Usage: run_common.sh <configfile> [-m nerf|recolor|style] [extra flags...]
# Public interface mirrors the reference's scripts (run_llff.sh:1-100);
# the entry point is laenerf_tpu's CLI instead of main_nerf.py.

CONFIGFILE=$1; shift
if [ -z "$CONFIGFILE" ] || [ ! -f "$CONFIGFILE" ]; then
  echo "Error: config file required (got '$CONFIGFILE')."; exit 1
fi
source "$CONFIGFILE"

model="nerf"
EXTRA=()
while [[ $# -gt 0 ]]; do
  case $1 in
    -m|--model) model="$2"; shift 2;;
    *) EXTRA+=("$1"); shift;;
  esac
done

ts=$(date +%s)
COMMON=(
  "$data_dir" --workspace "$workspace" --iters "$iters" --bound "$bound"
  --scale "$scale" --bg_radius "$bg_radius" --density_thresh "$density_thresh"
  --min_near "${min_near:-0.2}" --no_bg -O --dt_gamma "${dt_gamma:-0}"
)
# per-scene AABB recentering (reference run_llff.sh passes --offset; word-split
# the 'x y z' string into three args)
[ -n "$offset" ] && COMMON+=(--offset $offset)
[ -n "$extra_flags" ] && COMMON+=($extra_flags)

EDIT=(
  --train_steps_style 10000 --train_steps_distill 7000
  --weight_loss_non_uniform 1e-7 --offset_loss 5e-5 --palette_loss_valid 1
  --num_palette_bases 8 --ablation_dir test --smooth_trans_weight 1e-3
)

case $model in
  nerf)
    python -m laenerf_tpu.pipeline.cli "${COMMON[@]}" "${EXTRA[@]}";;
  recolor)
    python -m laenerf_tpu.pipeline.cli "${COMMON[@]}" -m recolor --run_all \
      "${EDIT[@]}" --ablation_folder "${name}_recolor_${ts}" "${EXTRA[@]}";;
  style)
    python -m laenerf_tpu.pipeline.cli "${COMMON[@]}" -m style --run_all \
      "${EDIT[@]}" --ablation_folder "${name}_style_${ts}" \
      --tv_weight 1e-4 --tv_depth_guide --depth_disc_weight 5e-4 \
      --style_weight 1.3e2 --style_layers 10 --style_layers 12 \
      --style_layers 14 --style_image "${style_image:-style_images/wave_style.png}" \
      "${EXTRA[@]}";;
  *) echo "Invalid model. Options are: nerf, recolor, style"; exit 1;;
esac
