#!/bin/bash
# MuST-C data prep: corpus yaml + wav dir -> talks/segments TSVs per split
# (in-repo replacement for the SHAS prepare_dataset_for_segmentation the
# reference shells out to).
set -e
. $(dirname $0)/path.sh

lang_pair=${1:-en-de}
corpus=$MUSTC_ROOT/v2.0_IWSLT2022/$lang_pair/data
out=$SEGM_DATA_ROOT/$lang_pair
mkdir -p $out

for split in train dev tst-COMMON; do
  python -c "
from wav2vecsegmenter_tpu.data.prep import prepare_dataset_for_segmentation
prepare_dataset_for_segmentation(
    '$corpus/$split/txt/$split.yaml', '$corpus/$split/wav', '$out', '$split')
print('prepared $split')
"
done
