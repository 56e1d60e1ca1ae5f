#!/bin/bash
# Usage: bash scripts/run_llff.sh scripts/configs_llff/<scene>.sh -m {nerf,recolor,style}
DIR=$(dirname "$0")
bash "$DIR/run_common.sh" "$@"
