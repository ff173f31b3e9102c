#!/bin/bash
# Environment layout (mirrors the reference's runs/path.sh surface).
ROOT=$(cd $(dirname $0)/..; pwd)
export ROOT
export TOOLS_ROOT=$ROOT/tools
export FAIRSEQ_ROOT=$TOOLS_ROOT/fairseq
# The mWER resegmenter is built in-repo (native/mwer) — no download needed.
export MWERSEGMENTER_ROOT=$ROOT/native/mwer
export DATA_ROOT=$ROOT/data
export MUSTC_ROOT=$DATA_ROOT/corpus/MuST-C
export SEGM_DATA_ROOT=$DATA_ROOT/training/MUSTC
export MODELS_ROOT=$ROOT/models
