#!/bin/bash
# Usage: bash scripts/run_mip360.sh scripts/configs_mip360/<scene>.sh -m {nerf,recolor,style}
DIR=$(dirname "$0")
bash "$DIR/run_common.sh" "$@"
