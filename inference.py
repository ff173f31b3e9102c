#!/usr/bin/env python
"""Entry shim: batch inference (see wav2vecsegmenter_tpu/cli/inference.py)."""
from wav2vecsegmenter_tpu.cli.inference import main

if __name__ == "__main__":
    main()
