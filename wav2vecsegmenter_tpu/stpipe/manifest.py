"""Custom-segmentation dataset preparation: fbank80 zip + fairseq TSV
manifest.

Native replacement for the reference's ``prepare_custom_dataset``
(lib/eval_scripts/prepare_custom_dataset.py:89-153), which imports fairseq's
speech_to_text data utils.  Output contract is identical so any external
fairseq install consumes it directly:
  * ``fbank80.zip``: uncompressed .npy features per utterance;
  * ``{yaml_name}.tsv``: columns id/audio/n_frames/tgt_text/speaker/tgt_lang
    with audio = ``<zip_path>:<byte_offset>:<byte_length>`` (fairseq
    get_zip_manifest format).
"""

from __future__ import annotations

import io
import zipfile
from itertools import groupby
from pathlib import Path

import numpy as np
import yaml

from ..data.audio import read_wav_window, wav_info
from .fbank import fbank80

MANIFEST_COLUMNS = ["id", "audio", "n_frames", "tgt_text", "speaker", "tgt_lang"]
SR = 16_000


def iter_yaml_segments(path_to_yaml: Path, path_to_wavs: Path,
                       sort_by_offset: bool = True):
    """(wav_path, offset_samples, n_samples, speaker, utt_id) per segment
    (reference CustomDataset, prepare_custom_dataset.py:33-87)."""
    with open(path_to_yaml) as f:
        segments = yaml.safe_load(f)
    for seg in segments:
        seg["offset"] = float(seg["offset"])
    for wav_filename, group in groupby(segments, key=lambda x: x["wav"]):
        wav_path = path_to_wavs / wav_filename
        _, sample_rate, _ = wav_info(wav_path)
        seg_group = sorted(group, key=lambda x: x["offset"]) if sort_by_offset \
            else list(group)
        for i, segment in enumerate(seg_group):
            offset = int(float(segment["offset"]) * sample_rate)
            n_frames = int(float(segment["duration"]) * sample_rate)
            yield (wav_path, offset, n_frames, segment["speaker_id"],
                   f"{wav_path.stem}_{i}")


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def create_feature_zip(zip_path: Path, features: dict[str, np.ndarray]) -> dict:
    """Write features as stored (uncompressed) .npy zip entries; returns
    {utt_id: (byte_offset, byte_length, n_frames)} of the entry *content*."""
    manifest = {}
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        for utt_id, feat in features.items():
            zf.writestr(f"{utt_id}.npy", _npy_bytes(feat))
    # re-scan for content offsets (fairseq reads via byte ranges)
    with zipfile.ZipFile(zip_path) as zf:
        for info in zf.infolist():
            utt_id = Path(info.filename).stem
            offset = info.header_offset + 30 + len(info.filename) + \
                len(info.extra)
            manifest[utt_id] = (offset, info.file_size,
                                features[utt_id].shape[0])
    return manifest


def prepare_custom_dataset(
    path_to_yaml: str | Path,
    path_to_wavs: str | Path,
    tgt_lang: str,
    use_audio_input: int = 0,
    sort_by_offset: bool = True,
) -> Path:
    """custom_segments.yaml -> fbank80.zip + TSV manifest next to the yaml.
    Returns the TSV path."""
    if use_audio_input:
        raise NotImplementedError(
            "flac audio input path not implemented; fbank80 features only")
    path_to_yaml = Path(path_to_yaml)
    path_to_wavs = Path(path_to_wavs)
    out_dir = path_to_yaml.parent
    zip_path = out_dir / "fbank80.zip"

    features: dict[str, np.ndarray] = {}
    order: list[tuple[str, str]] = []  # (utt_id, speaker)
    for wav_path, offset, n_samples, speaker, utt_id in iter_yaml_segments(
        path_to_yaml, path_to_wavs, sort_by_offset
    ):
        waveform = read_wav_window(wav_path, offset, n_samples)
        features[utt_id] = fbank80(waveform)
        order.append((utt_id, speaker))

    zmanifest = create_feature_zip(zip_path, features)

    import pandas as pd

    rows = {c: [] for c in MANIFEST_COLUMNS}
    for utt_id, speaker in order:
        off, length, n_frames = zmanifest[utt_id]
        rows["id"].append(utt_id)
        rows["audio"].append(f"{zip_path.as_posix()}:{off}:{length}")
        rows["n_frames"].append(n_frames)
        rows["tgt_text"].append("NA")
        rows["speaker"].append(speaker)
        rows["tgt_lang"].append(tgt_lang)
    df = pd.DataFrame.from_dict(rows)
    tsv_path = out_dir / f"{path_to_yaml.stem}.tsv"
    df.to_csv(tsv_path, sep="\t", index=False)
    return tsv_path
