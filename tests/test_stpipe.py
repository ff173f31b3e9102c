"""ST-pipeline layer tests: fbank, manifests, xml, generation parsing, and a
full eval_st run with a fake fairseq-generate + the native mWER resegmenter +
sacreBLEU scoring."""

import os
import stat
import zipfile
from pathlib import Path

import numpy as np
import pytest
import yaml

from wav2vecsegmenter_tpu.config import Config
from wav2vecsegmenter_tpu.data.audio import write_wav
from wav2vecsegmenter_tpu.stpipe.fbank import fbank80, mel_filterbank
from wav2vecsegmenter_tpu.stpipe.generation import format_generation_output
from wav2vecsegmenter_tpu.stpipe.manifest import prepare_custom_dataset
from wav2vecsegmenter_tpu.stpipe.xml import original_segmentation_to_xml


def test_fbank_shape_and_scaling():
    t = np.arange(16000) / 16000
    wav = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    feats = fbank80(wav)
    # 1 s @ 25ms/10ms snip_edges: 1 + (16000-400)//160 = 98 frames
    assert feats.shape == (98, 80)
    louder = fbank80(wav * 2)
    assert louder.mean() > feats.mean()
    # 440 Hz tone: energy concentrated in low mel bins
    assert feats[:, :20].mean() > feats[:, 60:].mean()


def test_fbank_golden_vectors():
    """Numerical parity with kaldi fbank (torchaudio.compliance.kaldi
    defaults via fairseq extract_fbank_features — reference
    lib/eval_scripts/prepare_custom_dataset.py:16-24).

    Golden features in tests/data/fbank_golden.npz were generated with
    transformers.Speech2TextFeatureExtractor (num_mel_bins=80,
    do_ceptral_normalize=False), HF's numpy port of
    torchaudio.compliance.kaldi.fbank — an implementation independent of
    stpipe/fbank.py.  Three stress waveforms: a 100->4000 Hz sine sweep,
    gated noise (silence gaps), and an impulse train with DC offset
    (exercises DC removal + preemphasis + the mel floor).
    """
    golden = np.load(Path(__file__).parent / "data" / "fbank_golden.npz")
    for name in ("sweep", "noise", "impulse"):
        feats = fbank80(golden[f"wav_{name}"])
        ref = golden[f"fbank_{name}"]
        assert feats.shape == ref.shape, name
        np.testing.assert_allclose(feats, ref, atol=1e-4, rtol=0,
                                   err_msg=name)


def test_fbank_vs_live_kaldi_oracle():
    """When transformers' S2T extractor is importable, re-derive the oracle
    live on fresh random audio (catches golden-file staleness)."""
    pytest.importorskip("transformers")
    from transformers import Speech2TextFeatureExtractor

    fe = Speech2TextFeatureExtractor(
        feature_size=80, num_mel_bins=80, do_ceptral_normalize=False)
    rng = np.random.RandomState(7)
    wav = (rng.randn(23456) * 0.2).astype(np.float32).clip(-1, 1)
    ref = fe(wav, sampling_rate=16000, return_tensors="np").input_features[0]
    np.testing.assert_allclose(fbank80(wav), ref, atol=1e-4, rtol=0)


def test_mel_filterbank_partition():
    fb = mel_filterbank(80, 512, 16000)
    assert fb.shape == (80, 257)
    assert (fb >= 0).all()
    # every filter has support
    assert (fb.sum(axis=1) > 0).all()


def test_prepare_custom_dataset(tmp_path):
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    rng = np.random.RandomState(0)
    write_wav(wav_dir / "talkA.wav", rng.randn(16000 * 5).astype(np.float32) * 0.1)
    seg_yaml = tmp_path / "custom_segments.yaml"
    rows = [
        {"duration": 2.0, "offset": 0.0, "rW": 0, "uW": 0,
         "speaker_id": "NA", "wav": "talkA.wav"},
        {"duration": 1.5, "offset": 2.5, "rW": 0, "uW": 0,
         "speaker_id": "NA", "wav": "talkA.wav"},
    ]
    with open(seg_yaml, "w") as f:
        yaml.dump(rows, f)

    tsv = prepare_custom_dataset(seg_yaml, wav_dir, "de", 0)
    assert tsv.exists()
    import pandas as pd

    df = pd.read_csv(tsv, sep="\t")
    assert list(df.columns) == ["id", "audio", "n_frames", "tgt_text",
                                "speaker", "tgt_lang"]
    assert len(df) == 2
    assert (df["tgt_lang"] == "de").all()

    # fairseq byte-range contract: zip_path:offset:length -> np.load works
    zip_path, off, length = df.iloc[0]["audio"].rsplit(":", 2)
    with open(zip_path, "rb") as f:
        f.seek(int(off))
        blob = f.read(int(length))
    import io

    feat = np.load(io.BytesIO(blob))
    assert feat.shape[1] == 80
    assert feat.shape[0] == df.iloc[0]["n_frames"]


def test_xml_and_generation_roundtrip(tmp_path):
    seg = [
        {"duration": 2.0, "offset": 0.0, "wav": "t1.wav"},
        {"duration": 2.0, "offset": 2.0, "wav": "t1.wav"},
        {"duration": 2.0, "offset": 0.0, "wav": "t2.wav"},
    ]
    with open(tmp_path / "dev.yaml", "w") as f:
        yaml.dump(seg, f)
    (tmp_path / "dev.en").write_text("hello there\nsecond line\nother talk\n")
    (tmp_path / "dev.de").write_text("hallo da\nzweite zeile\nanderer vortrag\n")
    paths = original_segmentation_to_xml(
        tmp_path / "dev.yaml", tmp_path / "dev.en", tmp_path / "dev.de",
        tmp_path,
    )
    assert len(paths) == 2
    src = (tmp_path / "dev.en.xml").read_text()
    assert src.count("<doc") == 2 and src.count("<seg") == 3

    gen = tmp_path / "translations.txt"
    gen.write_text(
        "H-1 -0.5 foo\nD-1 -0.5 zweite zeile\nD-0 -0.3 hallo da\n"
        "D-2 -0.9 anderer vortrag\n"
    )
    out = format_generation_output(gen)
    assert out.read_text().splitlines() == [
        "hallo da", "zweite zeile", "anderer vortrag"
    ]


def test_eval_st_end_to_end(tmp_path, monkeypatch):
    """Full L6 path with a fake fairseq-generate: dataset prep, generation
    parsing, native mWER alignment, sacreBLEU scoring."""
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    rng = np.random.RandomState(1)
    write_wav(wav_dir / "t1.wav", rng.randn(16000 * 6).astype(np.float32) * 0.1)

    # corpus ("original") segmentation + texts
    orig = [
        {"duration": 3.0, "offset": 0.0, "wav": "t1.wav"},
        {"duration": 3.0, "offset": 3.0, "wav": "t1.wav"},
    ]
    with open(tmp_path / "dev.yaml", "w") as f:
        yaml.dump(orig, f)
    (tmp_path / "dev.en").write_text(
        "hello world this is the very first segment\n"
        "and here comes the second longer segment indeed\n")
    (tmp_path / "dev.de").write_text(
        "hallo welt dies ist das allererste segment\n"
        "und hier kommt das zweite laengere segment tatsaechlich\n")

    # the segmentation under evaluation (different boundaries)
    custom = [
        {"duration": 2.5, "offset": 0.0, "rW": 0, "uW": 0,
         "speaker_id": "NA", "wav": "t1.wav"},
        {"duration": 3.0, "offset": 2.8, "rW": 0, "uW": 0,
         "speaker_id": "NA", "wav": "t1.wav"},
    ]

    # fake fairseq-generate on PATH: emits hypothesis D-lines
    bindir = tmp_path / "bin"
    bindir.mkdir()
    fake = bindir / "fairseq-generate"
    fake.write_text(
        "#!/bin/bash\n"
        "echo 'D-0 -0.1 hallo welt dies ist das allererste segment und hier'\n"
        "echo 'D-1 -0.2 kommt das zweite laengere segment tatsaechlich'\n"
    )
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    from wav2vecsegmenter_tpu.stpipe.eval_st import eval_st

    infer_config = Config({
        "cust_seg_yaml": "custom_segments.yaml",
        "st_model_dir": str(tmp_path / "stmodel"),
        "st_ckpt": "ckpt.pt",
        "fairseq_root": str(tmp_path),
        "st_metrics": ["bleu"],
        "infer_data": Config({
            "wav_dir": str(wav_dir),
            "tgt_lang": "de",
            "src_lang": "en",
            "orig_seg_yaml": str(tmp_path / "dev.yaml"),
            "orig_src_txt": str(tmp_path / "dev.en"),
            "orig_tgt_txt": str(tmp_path / "dev.de"),
        }),
    })
    results_path = tmp_path / "results"
    results = eval_st(infer_config, custom, results_path, "dac")

    assert results["eval_st_n_segments_dac"] == 2
    assert "eval_st_bleu_dac" in results
    # the fake hypothesis realigned = exact reference -> BLEU 100
    assert results["eval_st_bleu_dac"] == pytest.approx(100.0)
    segs = (results_path / "__segments").read_text().splitlines()
    assert segs == [
        "hallo welt dies ist das allererste segment",
        "und hier kommt das zweite laengere segment tatsaechlich",
    ]


def test_fairseq_generate_cmd_styles(tmp_path):
    """Command-line parity: the in-training eval command always targets the
    joint-s2t task with --skip-invalid-size-inputs-valid-test (reference
    train.py:130-148); the standalone ST-pipe CLI dispatches on the model
    dir basename and rejects unknown models (inference_st_pipe.py:96-124)."""
    from wav2vecsegmenter_tpu.config import Config
    from wav2vecsegmenter_tpu.stpipe.eval_st import fairseq_generate_cmd

    def cfg(model_dir):
        return Config({
            "st_model_dir": model_dir,
            "st_ckpt": "ckpt.pt",
            "cust_seg_yaml": "custom_segments.yaml",
            "fairseq_root": "/fsq",
        })

    rp = tmp_path
    train_cmd = fairseq_generate_cmd(cfg("/models/whatever"), rp)
    assert "--skip-invalid-size-inputs-valid-test" in train_cmd
    assert "--task speech_text_joint_to_text" in train_cmd

    joint = fairseq_generate_cmd(
        cfg("/models/joint-s2t-mustc-en-de"), rp, style="cli")
    assert "--task speech_text_joint_to_text" in joint
    assert "--skip-invalid-size-inputs-valid-test" not in joint
    assert "--load-speech-only" in joint

    multi = fairseq_generate_cmd(
        cfg("/models/mustc_multilingual_st"), rp, style="cli")
    assert "--task speech_to_text" in multi
    assert "--prefix-size 1" in multi
    assert "--max-tokens 50000" in multi

    with pytest.raises(ValueError, match="Unknown model dir"):
        fairseq_generate_cmd(cfg("/models/other"), rp, style="cli")
