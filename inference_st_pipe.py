#!/usr/bin/env python
"""Entry shim: end-to-end ST pipeline (see wav2vecsegmenter_tpu/cli/inference_st_pipe.py)."""
from wav2vecsegmenter_tpu.cli.inference_st_pipe import main

if __name__ == "__main__":
    main()
