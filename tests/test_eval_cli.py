"""scripts/eval_f1.py — the standalone frame-F1 runbook stage (the metric
the reference only exposes inside train.py's periodic eval)."""

import json
import runpy
import sys
from pathlib import Path

import pytest
import yaml

import jax

from wav2vecsegmenter_tpu.checkpoints.io import save_orbax
from wav2vecsegmenter_tpu.config import compose, save_config
from wav2vecsegmenter_tpu.data.prep import prepare_dataset_for_segmentation

from .helpers import make_speechlike_wav, tiny_shas

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module", autouse=True)
def patch_tiny_model():
    from wav2vecsegmenter_tpu.config import registry

    orig = registry._ALIASES["lib.models.SHAS"]

    def build_tiny(**kwargs):
        return tiny_shas()

    registry.register("lib.models.SHAS", "tests.helpers:_tiny_builder")
    import tests.helpers as helpers

    helpers._tiny_builder = build_tiny
    try:
        yield
    finally:
        registry._ALIASES["lib.models.SHAS"] = orig


def test_eval_f1_script(tmp_path, monkeypatch):
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    make_speechlike_wav(wav_dir / "talkA.wav", duration_secs=22, seed=0)
    rows = []
    t = 0.2
    while t + 3.0 < 22:
        rows.append({"duration": 2.8, "offset": round(t, 2),
                     "speaker_id": "NA", "wav": "talkA.wav"})
        t += 3.5
    with open(tmp_path / "dev.yaml", "w") as f:
        yaml.dump(rows, f)
    talks_tsv, segments_tsv = prepare_dataset_for_segmentation(
        tmp_path / "dev.yaml", wav_dir, tmp_path, split="dev")

    model = tiny_shas()
    params = model.init(jax.random.PRNGKey(0))
    save_orbax(tmp_path / "ckpt", params)
    train_cfg = compose(REPO / "conf", "train")
    save_config(train_cfg, tmp_path / "config.yaml")

    out = tmp_path / "metrics.json"
    argv = [
        str(REPO / "scripts" / "eval_f1.py"),
        "--ckpt", str(tmp_path / "ckpt"),
        "--config", str(tmp_path / "config.yaml"),
        "--talk-list", str(talks_tsv),
        "--segments-list", str(segments_tsv),
        "--segment-length", "4",
        "--batch-size", "3",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        runpy.run_path(str(REPO / "scripts" / "eval_f1.py"),
                       run_name="__main__")
    lines = [ln for ln in buf.getvalue().splitlines()
             if ln.startswith("{")]
    metrics = json.loads(lines[-1])
    for k in ("eval_f1", "eval_accuracy", "eval_precision", "eval_recall",
              "eval_loss"):
        assert k in metrics, metrics
        assert 0.0 <= float(metrics[k]) or k == "eval_loss"
    assert 0.0 <= metrics["eval_f1"] <= 1.0
