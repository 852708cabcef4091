#!/usr/bin/env bash
# One-command BOP dress rehearsal (VERDICT r2 #6):
#   BOP-layout directory + checkpoint -> converted PoET JSON -> --eval_bop CSV
#
# Usage:
#   scripts/repro_bop.sh BOP_DIR CHECKPOINT WORK_DIR [DATASET] [SPLIT] [-- CLI flags...]
#
#   BOP_DIR     unpacked BOP archive root (contains <split>/<scene>/{rgb,
#               scene_gt.json, scene_gt_info.json, scene_camera.json} and
#               models_eval/)
#   CHECKPOINT  anything --resume accepts: an orbax dir, a reference model-zoo
#               .pth/.npz, or a URL to one
#   WORK_DIR    scratch dir; becomes the PoET-format dataset_path; the CSV
#               lands in WORK_DIR/run/bop_<bbox_mode>/<dataset>.csv
#   DATASET     ycbv (default) | lmo
#   SPLIT       BOP image subdir to evaluate (default: test)
#   Everything after `--` is passed through to the poet_tpu CLI (model dims,
#   --bbox_mode backbone, --image sizes, ...). The paper config needs no
#   extra flags.
#
# Example (real data, zoo weights):
#   scripts/repro_bop.sh /data/ycbv ~/poet_ycbv.pth /tmp/bop_run ycbv test \
#       -- --bbox_mode backbone --backbone_cfg configs/ycbv_rcnn.yaml
#
# The BASELINE.md 0.1% ADD(-S) contract run is this command + the BOP toolkit
# on the produced CSV. Exercised end-to-end on a synthetic BOP-format fixture
# by tests/test_repro_bop.py.
set -euo pipefail

BOP_DIR=$(realpath "$1"); CKPT=$2; WORK=$3
DATASET=${4:-ycbv}; SPLIT=${5:-test}
shift 3
[ $# -gt 0 ] && [ "$1" != "--" ] && shift
[ $# -gt 0 ] && [ "$1" != "--" ] && shift
if [ $# -gt 0 ] && [ "$1" == "--" ]; then shift; fi
EXTRA=("$@")

mkdir -p "$WORK/annotations" "$WORK/test_all"

# 1. BOP scene dirs -> PoET-COCO annotation JSON (split name 'test' so the
#    standard split map picks it up; file_names stay <SPLIT>/<scene>/rgb/...)
#    REPRO_KEYFRAMES=1 restricts YCB-V to the vendored 2,949-frame keyframe
#    list (dataset_files/keyframes.txt) — the paper's eval split.
KF_FLAG=()
if [ "${REPRO_KEYFRAMES:-0}" = "1" ]; then KF_FLAG=(--keyframes vendored); fi
python -m poet_tpu.data.converters \
    --dataset "$DATASET" --base_path "$BOP_DIR" --split "$SPLIT" \
    --types real --output "$WORK/annotations/test.json" "${KF_FLAG[@]}"

# 2. PoET directory layout: the loader opens <dataset_path>/test_all/<file_name>
#    and the evaluator reads <dataset_path>/models_eval; link both into WORK.
ln -sfn "$BOP_DIR/$SPLIT" "$WORK/test_all/$SPLIT"
ln -sfn "$BOP_DIR/models_eval" "$WORK/models_eval"

# 3. checkpoint + eval_bop -> CSV. classes/symmetries JSONs resolve to the
#    shipped dataset_files/ assets automatically (_resolve_asset fallback).
python -m poet_tpu.cli \
    --dataset "$DATASET" --dataset_path "$WORK" --output_dir "$WORK/run" \
    --eval_bop --resume "$CKPT" "${EXTRA[@]}"

CSV=$(find "$WORK/run" -name "$DATASET.csv" | head -1)
echo "BOP CSV: $CSV ($(($(wc -l < "$CSV") - 1)) rows)"
