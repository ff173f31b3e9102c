#!/usr/bin/env python
"""Entry shim: wav dir -> custom_segments.yaml (see wav2vecsegmenter_tpu/cli/segment.py)."""
from wav2vecsegmenter_tpu.cli.segment import main

if __name__ == "__main__":
    main()
