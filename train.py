#!/usr/bin/env python
"""Entry shim: SFC training (see wav2vecsegmenter_tpu/cli/train.py)."""
from wav2vecsegmenter_tpu.cli.train import main

if __name__ == "__main__":
    main()
