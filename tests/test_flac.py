"""FLAC encoder (native C++ + python fallback) for the use_audio_input
ST-eval path: round-trip, CRC conformance, cross-backend byte equality, and
the prepare_custom_dataset flac.zip contract
(reference lib/eval_scripts/prepare_custom_dataset.py:104-153)."""

import io
import zipfile

import numpy as np
import pytest
import yaml

from wav2vecsegmenter_tpu.data import native_audio
from wav2vecsegmenter_tpu.data.audio import write_wav
from wav2vecsegmenter_tpu.stpipe.flac import (
    _encode_flac_py,
    decode_flac,
    encode_flac,
    to_int16,
)
from wav2vecsegmenter_tpu.stpipe.manifest import prepare_custom_dataset


@pytest.mark.parametrize("n", [0x7F + 1, 1000, 4096, 4097, 40000])
def test_flac_roundtrip_py(rng, n):
    samples = (rng.randn(n) * 8000).astype(np.int16)
    blob = _encode_flac_py(samples, 16000)
    decoded, sr = decode_flac(blob)
    assert sr == 16000
    np.testing.assert_array_equal(decoded, samples)


def test_flac_constant_blocks(rng):
    # silence block + noise block: CONSTANT and VERBATIM subframes mix
    samples = np.concatenate([
        np.zeros(4096, np.int16),
        (rng.randn(5000) * 8000).astype(np.int16),
        np.full(4096, -3, np.int16),
    ])
    blob = _encode_flac_py(samples, 16000)
    decoded, _ = decode_flac(blob)
    np.testing.assert_array_equal(decoded, samples)
    # the constant blocks must actually compress
    assert len(blob) < 2 * len(samples)


def test_flac_native_matches_python(rng):
    if not native_audio.available():
        pytest.skip("native encoder unavailable")
    samples = (rng.randn(10_000) * 8000).astype(np.int16)
    assert native_audio.encode_flac(samples, 16000) == \
        _encode_flac_py(samples, 16000)
    # multi-frame + constant mix
    samples2 = np.concatenate([np.zeros(4096, np.int16), samples])
    assert native_audio.encode_flac(samples2, 16000) == \
        _encode_flac_py(samples2, 16000)


def test_flac_crc_detects_corruption(rng):
    samples = (rng.randn(5000) * 8000).astype(np.int16)
    blob = bytearray(encode_flac(samples, 16000))
    blob[-100] ^= 0x40  # flip a bit inside the last frame
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


def test_flac_float_convention():
    f = np.array([-1.0, 0.0, 0.5, 32767 / 32768.0], np.float32)
    np.testing.assert_array_equal(to_int16(f), [-32768, 0, 16384, 32767])


def test_prepare_custom_dataset_audio_input(tmp_path, rng):
    """use_audio_input=1: flac.zip entries decode back to the exact wav
    windows; n_frames are waveform samples."""
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    wav = (rng.randn(16000 * 5).astype(np.float32) * 0.1).clip(-1, 1)
    write_wav(wav_dir / "talkA.wav", wav)
    seg_yaml = tmp_path / "custom_segments.yaml"
    rows = [
        {"duration": 2.0, "offset": 0.0, "rW": 0, "uW": 0,
         "speaker_id": "NA", "wav": "talkA.wav"},
        {"duration": 1.5, "offset": 2.5, "rW": 0, "uW": 0,
         "speaker_id": "NA", "wav": "talkA.wav"},
    ]
    with open(seg_yaml, "w") as f:
        yaml.dump(rows, f)

    tsv = prepare_custom_dataset(seg_yaml, wav_dir, "de", use_audio_input=1)
    import pandas as pd

    df = pd.read_csv(tsv, sep="\t")
    assert list(df.columns) == ["id", "audio", "n_frames", "tgt_text",
                                "speaker", "tgt_lang"]
    assert len(df) == 2
    assert df.iloc[0]["n_frames"] == 2 * 16000  # samples, not fbank frames
    assert (tmp_path / "flac.zip").exists()

    # fairseq byte-range contract: zip:offset:length is a full flac stream
    zip_path, off, length = df.iloc[0]["audio"].rsplit(":", 2)
    with open(zip_path, "rb") as f:
        f.seek(int(off))
        blob = f.read(int(length))
    decoded, sr = decode_flac(blob)
    assert sr == 16000
    expect = to_int16(wav[: 2 * 16000])
    np.testing.assert_array_equal(decoded, expect)

    # zip entries are named {utt_id}.flac
    with zipfile.ZipFile(zip_path) as zf:
        assert sorted(zf.namelist()) == ["talkA_0.flac", "talkA_1.flac"]


def test_prepare_custom_dataset_drops_tiny_segments(tmp_path, rng):
    """fairseq filter_manifest_df eval semantics: segments under 5 feature
    frames (50 ms) are dropped from the manifest in both modes."""
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    write_wav(wav_dir / "t.wav",
              (rng.randn(16000).astype(np.float32) * 0.1))
    seg_yaml = tmp_path / "custom_segments.yaml"
    rows = [
        {"duration": 0.5, "offset": 0.0, "speaker_id": "NA", "wav": "t.wav"},
        {"duration": 0.02, "offset": 0.6, "speaker_id": "NA", "wav": "t.wav"},
    ]
    with open(seg_yaml, "w") as f:
        yaml.dump(rows, f)
    import pandas as pd

    for audio_in in (0, 1):
        tsv = prepare_custom_dataset(seg_yaml, wav_dir, "de", audio_in)
        df = pd.read_csv(tsv, sep="\t")
        assert len(df) == 1, f"use_audio_input={audio_in}"
        assert df.iloc[0]["id"] == "t_0"
