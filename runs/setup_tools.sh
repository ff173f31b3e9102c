#!/bin/bash
# Build the native tools; optionally clone fairseq for the external ST model.
# Unlike the reference's setup (which downloads the mwerSegmenter tarball and
# patches it for python2), the mWER resegmenter here is an in-repo C++ tool.
set -e
. $(dirname $0)/path.sh

make -C $ROOT/native/mwer
make -C $ROOT/native/audio

if [ "$1" == "--with-fairseq" ]; then
  git clone -b shas https://github.com/mt-upc/fairseq.git $FAIRSEQ_ROOT
  pip install --editable $FAIRSEQ_ROOT
fi
