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
