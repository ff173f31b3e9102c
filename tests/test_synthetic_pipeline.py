"""Synthetic-data pipeline: stage 1 (segmentation tree) end to end with a
tiny model, and stage 3 (tournament selection) on synthetic trees."""

from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest
import yaml

import jax

from wav2vecsegmenter_tpu.checkpoints.io import save_orbax
from wav2vecsegmenter_tpu.config import compose, registry, save_config

from .helpers import make_speechlike_wav, tiny_shas

CONF = Path(__file__).resolve().parents[1] / "conf"


def test_stage1_generate_segmentation_tree(tmp_path):
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    make_speechlike_wav(wav_dir / "t1.wav", duration_secs=30, seed=2)

    # fake training outputs dir: .hydra config + orbax ckpt
    outputs = tmp_path / "outputs"
    (outputs / ".hydra").mkdir(parents=True)
    cfg = compose(CONF, "train", overrides=["exp_name=exp"])
    save_config(cfg, outputs / ".hydra" / "config.yaml")
    model = tiny_shas()
    params = model.init(jax.random.PRNGKey(0))
    save_orbax(outputs / "exp" / "ckpts" / "epoch-0", params)

    import tests.helpers as helpers

    helpers._tiny_builder_synth = lambda **kw: tiny_shas()
    orig = registry._ALIASES["lib.models.SHAS"]
    registry.register("lib.models.SHAS", "tests.helpers:_tiny_builder_synth")
    try:
        from wav2vecsegmenter_tpu.cli.prepare_synthetic_data import (
            generate_segmentation_tree,
        )

        args = SimpleNamespace(
            save_dir=str(tmp_path / "synth"),
            outputs=str(outputs),
            checkpoint="epoch-0",
            path_to_wavs=str(wav_dir),
            inference_segment_length=4,
            inference_times=1,
            inference_batch_size=2,
            max_segment_length=6,
            min_segment_length=0.2,
            boundary_threshold=0.5,
            trim_threshold=0.0,
            tree_depth=4,
        )
        generate_segmentation_tree(args)
    finally:
        registry._ALIASES["lib.models.SHAS"] = orig

    tree_yaml = tmp_path / "synth" / "custom_segments.tree.yaml"
    assert tree_yaml.exists()
    rows = yaml.safe_load(tree_yaml.read_text())
    lengths = dict(
        line.split("\t")
        for line in (tmp_path / "synth" / "tree.length").read_text().splitlines()
    )
    assert "t1.wav" in lengths and int(lengths["t1.wav"]) >= 1
    for r in rows or []:
        assert r["wav"] == "t1.wav"
        assert 0.2 <= r["duration"] <= 6
        # speaker_id carries the tree position
        assert int(r["speaker_id"]) >= 0


def test_tournament_promotes_better_children():
    from wav2vecsegmenter_tpu.cli.prepare_synthetic_data import tournament

    # depth-1 tree: root + 2 children; children's joined translation equals
    # the reference -> must win over a bad parent
    tgt_tree = ["completely wrong parent text here",
                "das ist der erste teil des vortrags",
                "und hier der zweite teil des texts"]
    tgt_segments = [[tgt_tree[0]], [tgt_tree[1]], [tgt_tree[2]]]
    src_segments = [[{"offset": 0.0, "duration": 8.0}],
                    [{"offset": 0.0, "duration": 4.0}],
                    [{"offset": 4.0, "duration": 4.0}]]
    ref = ["das ist der erste teil des vortrags und hier der zweite teil "
           "des texts"]
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        tournament("BLEU", 1, tgt_tree, tgt_segments, src_segments, ref,
                   td / "segs.yaml", td / "trans.txt", td / "talks.txt")
        talks = (td / "talks.txt").read_text().strip()
        assert talks == ref[0]
        trans = (td / "trans.txt").read_text().splitlines()
        assert len(trans) == 2  # children promoted, ordered by offset


def test_stages_2_3_end_to_end(tmp_path, monkeypatch):
    """Stages 2-3 driven through main() with a fake fairseq-generate
    subprocess (the harness from test_stpipe), on a hand-built depth-1
    stage-1 output.  Contract: reference lib/prepare_synthetic_data.py:
    135-388 — translation tree, tournament selection, MuST-C yaml + SFC
    TSV export."""
    import os
    import stat

    from wav2vecsegmenter_tpu.data.audio import write_wav

    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    rng = np.random.RandomState(3)
    write_wav(wav_dir / "t1.wav", rng.randn(16000 * 6).astype(np.float32) * 0.1)

    # stage-1 output: depth-1 tree (root node 0 = full talk, children 1+2)
    save_dir = tmp_path / "synth"
    save_dir.mkdir()
    tree = [
        {"duration": 6.0, "offset": 0.0, "rW": 0, "uW": 0,
         "speaker_id": "0", "wav": "t1.wav"},
        {"duration": 3.0, "offset": 0.0, "rW": 0, "uW": 0,
         "speaker_id": "1", "wav": "t1.wav"},
        {"duration": 3.0, "offset": 3.0, "rW": 0, "uW": 0,
         "speaker_id": "2", "wav": "t1.wav"},
    ]
    with open(save_dir / "custom_segments.tree.yaml", "w") as f:
        yaml.dump(tree, f, default_flow_style=True, sort_keys=False)
    (save_dir / "tree.length").write_text("t1.wav\t3\n")

    # corpus segmentation + reference translation of the same talk
    ref_de = ["hallo welt dies ist das allererste segment",
              "und hier kommt das zweite laengere segment"]
    src_yaml = tmp_path / "dev.yaml"
    with open(src_yaml, "w") as f:
        yaml.dump([
            {"duration": 3.0, "offset": 0.0, "wav": "t1.wav"},
            {"duration": 3.0, "offset": 3.0, "wav": "t1.wav"},
        ], f)
    (tmp_path / "dev.en").write_text("hello one\nhello two\n")
    (tmp_path / "dev.de").write_text("\n".join(ref_de) + "\n")

    # fake fairseq-generate: bad parent translation, perfect children
    bindir = tmp_path / "bin"
    bindir.mkdir()
    fake = bindir / "fairseq-generate"
    fake.write_text(
        "#!/bin/bash\n"
        "echo 'D-0 -0.1 voellig falscher elterntext hier'\n"
        f"echo 'D-1 -0.1 {ref_de[0]}'\n"
        f"echo 'D-2 -0.1 {ref_de[1]}'\n"
    )
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    st_dir = tmp_path / "stmodel"
    st_dir.mkdir()
    (st_dir / "ckpt.pt").write_text("")

    from wav2vecsegmenter_tpu.cli.prepare_synthetic_data import main

    main([
        "--stage", "2", "--stop_stage", "3",
        "--save_dir", str(save_dir),
        "--path_to_wavs", str(wav_dir),
        "--path_to_st_checkpoint", str(st_dir / "ckpt.pt"),
        "--fairseq_root", str(tmp_path),
        "--tgt_lang", "de",
        "--path_to_src_yaml", str(src_yaml),
        "--path_to_src_txt", str(tmp_path / "dev.en"),
        "--path_to_ref_txt", str(tmp_path / "dev.de"),
        "--tree_depth", "1",
    ])

    # stage 2 artifacts: manifest TSV + formatted translations in tree order
    assert (save_dir / "custom_segments.tree.tsv").exists()
    formatted = (save_dir / "translations_formatted.txt").read_text().splitlines()
    assert formatted == ["voellig falscher elterntext hier", *ref_de]

    # stage 3: children promoted over the bad parent
    synth = save_dir / "synthetic_data"
    talks = (synth / "translations_talks.txt").read_text().strip()
    assert talks == " ".join(ref_de)
    trans = (synth / "translations_custom_segments.txt").read_text().splitlines()
    assert trans == ref_de
    sel = yaml.safe_load((synth / "custom_segments.yaml").read_text())
    assert [s["offset"] for s in sel] == [0.0, 3.0]
    assert [s["duration"] for s in sel] == [3.0, 3.0]

    # MuST-C yaml + SFC-training TSVs (reference :370-388)
    mustc = (synth / "custom_segments.mustc.yaml").read_text()
    assert mustc.count("- {") == 2
    import pandas as pd

    talks_df = pd.read_csv(synth / "custom_segments.mustc_talks.tsv", sep="\t")
    segs_df = pd.read_csv(synth / "custom_segments.mustc_segments.tsv", sep="\t")
    assert talks_df.iloc[0]["total_frames"] == 6 * 16000
    assert len(segs_df) == 2
