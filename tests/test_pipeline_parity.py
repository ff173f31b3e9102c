"""End-to-end inference parity vs the reference pipeline.

Runs the reference's own dataset/collate/infer code (imported from
/root/reference with torchaudio and the HF tokenizer download shimmed) with a
small random torch model, then runs this framework's window pipeline with the
converted weights on the same wav — the stitched full-talk probabilities must
match within float tolerance.  This covers window grids, the batch-max
normalization semantics, +-1-frame corrections, stitching and NaN fill at
once (the BASELINE 'frame probs within fp tolerance' contract).
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from wav2vecsegmenter_tpu.checkpoints.torch_convert import (
    convert_hf_wav2vec2,
    convert_torch_sfc,
)
from wav2vecsegmenter_tpu.data.audio import read_wav_window, wav_info, write_wav
from wav2vecsegmenter_tpu.data.datasets import FixedSegmentationDatasetNoTarget
from wav2vecsegmenter_tpu.data.loader import BatchIterator
from wav2vecsegmenter_tpu.infer.pipeline import WindowInference, infer_talk

from .helpers import tiny_shas
from .test_model_parity import make_hf_model, our_cfg

REFERENCE = Path("/root/reference")


def _install_torchaudio_shim():
    """Fake torchaudio backed by our wav reader, for importing the reference
    dataset code (which the environment's missing torchaudio would block)."""
    if "torchaudio" in sys.modules and getattr(
        sys.modules["torchaudio"], "_is_shim", False
    ):
        return
    ta = types.ModuleType("torchaudio")
    ta._is_shim = True

    class _Info:
        def __init__(self, path):
            n, sr, _ = wav_info(path)
            self.num_frames = n
            self.sample_rate = sr

    def info(path):
        return _Info(path)

    def load(path, frame_offset=0, num_frames=-1):
        data = read_wav_window(path, frame_offset,
                               None if num_frames in (-1, None) else num_frames)
        return torch.from_numpy(data)[None, :], 16000

    ta.info = info
    ta.load = load
    backend = types.ModuleType("torchaudio.backend")
    sox = types.ModuleType("torchaudio.backend.sox_io_backend")
    sox.load = load
    backend.sox_io_backend = sox
    ta.backend = backend
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.backend"] = backend
    sys.modules["torchaudio.backend.sox_io_backend"] = sox


def _load_reference_modules():
    _install_torchaudio_shim()
    # the reference datautils downloads an HF tokenizer at import time; shim it
    import transformers

    class _FakeTok:
        def get_vocab(self):
            from wav2vecsegmenter_tpu.data.vocab import WAV2VEC2_CTC_CHAR_VOCAB

            return dict(WAV2VEC2_CTC_CHAR_VOCAB)

    class _FakeProc:
        tokenizer = _FakeTok()

    orig = transformers.Wav2Vec2Processor.from_pretrained
    transformers.Wav2Vec2Processor.from_pretrained = classmethod(
        lambda cls, *a, **k: _FakeProc())
    libdir = str(REFERENCE / "lib")
    if libdir not in sys.path:
        sys.path.insert(0, libdir)
    try:
        import dataset as ref_dataset  # noqa: F401
        import datautils as ref_datautils
        import evaluate as ref_evaluate
    finally:
        transformers.Wav2Vec2Processor.from_pretrained = orig
    assert str(REFERENCE) in ref_evaluate.__file__
    return ref_dataset, ref_datautils, ref_evaluate


class _TorchSHAS(torch.nn.Module):
    """Minimal torch composite exposing the attribute surface the reference
    infer() uses (model.wav2vec_model / model.seg_model)."""

    def __init__(self, hf_model, head):
        super().__init__()
        self.hf = hf_model
        self.head = head

        outer = self

        class W2V(torch.nn.Module):
            def forward(self, audio, attention_mask):
                return None, outer.hf(
                    audio, attention_mask=attention_mask
                ).last_hidden_state

        class Seg(torch.nn.Module):
            def forward(self, x, attention_mask):
                h = outer.head["transformer"](
                    x, src_key_padding_mask=~attention_mask.bool()
                )
                return outer.head["output_layer"](
                    outer.head["layer_norm"](h)
                ).squeeze(-1)

        self.wav2vec_model = W2V()
        self.seg_model = Seg()


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
@pytest.mark.parametrize("inference_times", [1, 2])
def test_full_pipeline_probs_match_reference(tmp_path, inference_times):
    ref_dataset, ref_datautils, ref_evaluate = _load_reference_modules()

    # synthetic talk: 37.3 s (odd length: exercises tail merge and +-1 paths)
    rng = np.random.RandomState(3)
    n = int(37.3 * 16000)
    wav = (rng.randn(n).astype(np.float32) * 0.1
           * ((np.arange(n) % 48000) < 40000))
    wav_path = tmp_path / "talk.wav"
    write_wav(wav_path, wav)

    hf_model, _ = make_hf_model(True, real_geometry=True)
    hf_model.encoder.layer_norm = torch.nn.Identity()
    torch.manual_seed(11)
    enc_layer = torch.nn.TransformerEncoderLayer(
        64, nhead=4, activation="gelu", batch_first=True, norm_first=True
    )
    head = torch.nn.ModuleDict({
        "transformer": torch.nn.TransformerEncoder(enc_layer, num_layers=1),
        "layer_norm": torch.nn.LayerNorm(64),
        "output_layer": torch.nn.Linear(64, 1),
    })
    head.eval()
    torch_model = _TorchSHAS(hf_model, head)
    torch_model.eval()

    # ---- reference pipeline (segment length 6 s, batch 2) ----
    seg_len, batch_size = 6, 2
    from torch.utils.data import DataLoader

    ref_probs_sum = None
    for it in range(inference_times):
        ds = ref_dataset.FixedSegmentationDatasetNoTarget(
            str(wav_path), seg_len, inference_times)
        ds.fixed_length_segmentation(it)
        dl = DataLoader(ds, batch_size=batch_size, num_workers=0,
                        shuffle=False, drop_last=False,
                        collate_fn=ref_datautils.CollateFn(pad_token_id=0))
        probs, _, _, _ = ref_evaluate.infer(
            torch_model, dl, torch.device("cpu"), False, "bce", None)
        ref_probs_sum = probs.copy() if ref_probs_sum is None \
            else ref_probs_sum + probs
    ref_probs = ref_probs_sum / inference_times

    # ---- our pipeline with converted weights ----
    model = tiny_shas()  # helpers.TINY_W2V already has the real geometry
    from .helpers import TINY_W2V
    import dataclasses
    model.w2v_cfg = dataclasses.replace(
        TINY_W2V, num_layers=3, apply_spec_augment=False)
    params = {
        "wav2vec": convert_hf_wav2vec2(hf_model.state_dict(), model.w2v_cfg),
        "seg": convert_torch_sfc(head.state_dict(), 1),
    }
    engine = WindowInference(model, params)
    ours_sum = None
    dataset = FixedSegmentationDatasetNoTarget(wav_path, seg_len,
                                               inference_times)
    for it in range(inference_times):
        dataset.fixed_length_segmentation(it)
        batches = BatchIterator(dataset, batch_size, float(seg_len),
                                shuffle=False)
        probs, _, _ = infer_talk(engine, batches, dataset.duration_outframes)
        ours_sum = probs.copy() if ours_sum is None else ours_sum + probs
    ours = ours_sum / inference_times

    assert ours.shape == ref_probs.shape
    diff = np.abs(ours - ref_probs)
    assert diff.max() < 5e-4, f"max prob diff {diff.max()} at {diff.argmax()}"
