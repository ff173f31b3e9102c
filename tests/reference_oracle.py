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


def load_reference_shas(ckpt_path, keep_layers, model_name=None,
                        ffn_adapter=False):
    """Instantiate the reference SHAS (lib/models.py:172) and load a
    published checkpoint into it — either layout (train.py:596-613).
    Requires local HF weights for the backbone (from_pretrained)."""
    import torch

    libdir = str(REFERENCE / "lib")
    if libdir not in sys.path:
        sys.path.insert(0, libdir)
    import importlib

    models = importlib.import_module("models")
    assert str(REFERENCE) in models.__file__

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd)
    full = any(k.startswith("wav2vec_model.") for k in sd)
    if not ffn_adapter:
        ffn_adapter = any("adapter" in k for k in sd)
    model = models.SHAS(
        wav2vec_model_name=model_name or "facebook/wav2vec2-xls-r-300m",
        wav2vec_keep_layers=keep_layers,
        finetune_wav2vec=full,
        wav2vec_ft_layers=keep_layers,
        finetune_w2v_feat_enc=False,
        finetune_w2v_ffn=False,
        ffn_adapter=ffn_adapter,
        n_transformer_enc_layers=1,
        n_transformer_enc_heads=8,
        init_dropout=0.1,
    )
    if full:
        model.load_state_dict(sd)
    else:
        model.seg_model.load_state_dict(
            {k.replace("seg_model.", "", 1): v for k, v in sd.items()})
    model.eval()
    return model
