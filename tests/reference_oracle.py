"""Load the reference implementation (read-only, /root/reference) as a test
oracle for differential parity tests.

The reference targets numpy<=1.23 (uses np.int, removed in 1.24) and imports
bare module names from its lib/ dir; we shim both.  Nothing from the
reference is shipped — it is only imported at test time to compare outputs.
"""

import sys
from pathlib import Path

import numpy as np

REFERENCE = Path("/root/reference")


def load_reference_segment():
    """Import /root/reference/lib/segment.py as `ref_segment`."""
    if not hasattr(np, "int"):
        np.int = int  # np.int removed in numpy>=1.24; reference pins 1.23
    libdir = str(REFERENCE / "lib")
    if libdir not in sys.path:
        sys.path.insert(0, libdir)
    import importlib

    mod = importlib.import_module("segment")
    # make sure we got the reference module, not ours
    assert str(REFERENCE) in mod.__file__
    return mod


def reference_available() -> bool:
    return (REFERENCE / "lib" / "segment.py").exists()
