#!/bin/bash
# Download the fairseq joint-s2t ST model used for downstream evaluation
# (same model the reference evaluates with, runs/prep_s2t_mustc.sh).
set -e
. $(dirname $0)/path.sh
dir=$MODELS_ROOT/st/joint-s2t-mustc-en-de
mkdir -p $dir
base=https://dl.fbaipublicfiles.com/joint_speech_text_4_s2t/must_c/en_de
for f in checkpoint_ave_10.pt config.yaml src_dict.txt dict.txt spm.model; do
  [ -f $dir/$f ] || wget -q -O $dir/$f $base/$f
done
# fairseq config fix (reference runs/prep_s2t_mustc.sh:10-15)
sed -i.bak "s#config_yaml: .*#config_yaml: config.yaml#" $dir/config.yaml || true
