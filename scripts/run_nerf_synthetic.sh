#!/bin/bash
# Usage: bash scripts/run_nerf_synthetic.sh scripts/configs_nerf_synthetic/<scene>.sh -m {nerf,recolor,style}
DIR=$(dirname "$0")
bash "$DIR/run_common.sh" "$@"
