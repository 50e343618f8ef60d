#!/bin/bash
# On-chip bootstrap demo: synthetic -> MagicPoint -> HA pseudo-labels ->
# SuperPoint -> HPatches-protocol eval (the reference's full pipeline,
# reference engine.py tasks, on fabricated stand-in data).
#
# Usage:  bash demo/run_demo.sh [leg]
#   leg = data | mp | export | sp | eval   (default: all, resumable)
set -e
cd "$(dirname "$0")/.."
export SPNERF_ROOT="${SPNERF_ROOT:-/root/repo/runs}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax}"
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LEG="${1:-all}"

run_leg() {
    case "$1" in
    data)
        python demo/make_standin_data.py --n-coco 400 ;;
    mp)
        python -m spnerf_tpu.cli --config-path demo/configs/magicpoint_syn_demo.yaml \
            --task train --validate-training ;;
    export)
        python -m spnerf_tpu.cli --config-path demo/configs/coco_export_demo.yaml \
            --task export_pseudo_labels --split training ;;
    sp)
        python -m spnerf_tpu.cli --config-path demo/configs/superpoint_demo.yaml \
            --task train ;;
    eval)
        python -m spnerf_tpu.eval.on_the_fly --config-path demo/configs/eval_demo.yaml \
            --mode repeatability --k-points 300
        python -m spnerf_tpu.eval.on_the_fly --config-path demo/configs/eval_demo.yaml \
            --mode descriptors --k-points 1000 ;;
    esac
}

if [ "$LEG" = all ]; then
    for l in data mp export sp eval; do run_leg "$l"; done
else
    run_leg "$LEG"
fi
