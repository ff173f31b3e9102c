#!/bin/bash
# CLI-contract shim matching the original mwerSegmenter driver script
# (invoked by the reference at inference_st_pipe.py:140-148):
#   segmentBasedOnMWER.sh <src.xml> <ref.xml> <hyp.txt> <sysid> <lang> \
#                         <out.xml> [normalize] [usecase]
# Outputs __segments and __mreference in the CWD plus <out.xml>.
DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
exec "$DIR/mwer_segmenter" "$@"
