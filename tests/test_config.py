import os
from pathlib import Path

import pytest

from wav2vecsegmenter_tpu.config import (
    MissingMandatoryValue,
    compose,
    load_config,
    merge,
    save_config,
    to_plain,
)

CONF = Path(__file__).resolve().parents[1] / "conf"


def test_compose_train_defaults():
    cfg = compose(CONF, "train")
    assert cfg.task.model["_target_"] == "lib.models.SHAS"
    assert cfg.task.model.wav2vec_keep_layers == 15
    assert cfg.data.train.segment_length == 20  # ${segment_length} interp
    assert cfg.batch_size == 14
    assert cfg.learning_rate == 2.5e-4
    # st_eval_online resolves via group-dir fallback into conf/st_eval/
    assert cfg.st_eval_online.algorithm.tag == "pthr"
    assert cfg.st_eval.algorithm.tag == "dac"
    assert cfg.work_dir == os.getcwd()


def test_group_selection_and_value_overrides():
    cfg = compose(
        CONF,
        "train",
        overrides=[
            "task=shas_focal",
            "batch_size=4",
            "task.model.finetune_wav2vec=true",
            "task.model.wav2vec_keep_layers=24",
            "+extra_key=hello",
        ],
    )
    assert cfg.task.loss["_target_"] == "lib.loss.FocalLoss"
    assert cfg.batch_size == 4
    assert cfg.task.model.finetune_wav2vec is True
    assert cfg.task.model.wav2vec_keep_layers == 24
    assert cfg.extra_key == "hello"


def test_missing_mandatory_value():
    cfg = compose(CONF, "segment")
    with pytest.raises(MissingMandatoryValue):
        _ = cfg.ckpt_path
    assert cfg.get("ckpt_path") is None
    cfg2 = compose(CONF, "segment", overrides=["ckpt_path=/tmp/x.pt"])
    assert cfg2.ckpt_path == "/tmp/x.pt"


def test_relative_interpolation():
    cfg = compose(CONF, "segment")
    # ${.data_dir} inside infer_data resolves against the sibling key
    assert cfg.infer_data.wav_dir.startswith(cfg.infer_data.data_dir)


def test_merge_training_config_at_inference(tmp_path):
    train_cfg = compose(CONF, "train", overrides=["task=shas_focal"])
    save_config(train_cfg, tmp_path / "config.yaml")
    reloaded = load_config(tmp_path / "config.yaml")
    seg_cfg = compose(CONF, "segment", overrides=["ckpt_path=/x.pt"])
    merged = merge(reloaded, seg_cfg)
    # model config comes from the training run; algorithm from the CLI config
    assert merged.task.loss["_target_"] == "lib.loss.FocalLoss"
    assert merged.algorithm.tag == "pthr"
    assert merged.ckpt_path == "/x.pt"


def test_to_plain_roundtrip():
    cfg = compose(CONF, "train")
    plain = to_plain(cfg)
    assert isinstance(plain, dict)
    assert plain["task"]["model"]["n_transformer_enc_heads"] == 8


def test_instantiate_vocab():
    from wav2vecsegmenter_tpu.config import instantiate

    cfg = compose(CONF, "train", overrides=["task=arseg"])
    vocab = instantiate(cfg.task.vocab)
    assert vocab.vocab_size == 4
    assert vocab.boundary_token_id == 0
    assert vocab.pad_token_id == 2


def test_all_config_groups_compose():
    """Every group file in conf/ composes without error."""
    for group in ("task", "algorithm", "data", "infer_data"):
        for path in sorted((CONF / group).glob("*.yaml")):
            cfg = compose(CONF, "train", overrides=[f"{group}={path.stem}"]) \
                if group in ("task", "data") else \
                compose(CONF, "segment",
                        overrides=[f"{group}={path.stem}"])
            assert cfg is not None, path
    for path in sorted((CONF / "st_eval").glob("*.yaml")):
        cfg = compose(CONF, "train", overrides=[f"st_eval={path.stem}"])
        assert cfg.st_eval.algorithm is not None


def test_expand_sweeps_and_override_dirname():
    """Hydra basic-sweeper expansion and ${hydra.job.override_dirname}
    semantics (cli/common.py): top-level commas sweep, bracketed commas
    don't; dirname is sorted key=value joined by ',' with excluded keys
    (and their dotted subkeys) dropped."""
    from wav2vecsegmenter_tpu.cli.common import (
        expand_sweeps,
        hydra_override_dirname,
        parse_cli,
    )

    multirun, overrides = parse_cli(
        ["-m", "a=1,2", "b=[x,y]", "c.d=z", "--flag"])
    assert multirun and overrides == ["a=1,2", "b=[x,y]", "c.d=z"]
    jobs = expand_sweeps(overrides)
    assert jobs == [
        ["a=1", "b=[x,y]", "c.d=z"],
        ["a=2", "b=[x,y]", "c.d=z"],
    ]
    assert not parse_cli(["a=1"])[0]

    name = hydra_override_dirname(
        ["outputs=/o", "ckpt=best", "+algorithm.threshold=0.5",
         "runtime.mesh.data=8", "batch_size=3"],
        exclude_keys=["outputs", "batch_size", "runtime"],
    )
    assert name == "algorithm.threshold=0.5,ckpt=best"

    # 3-way cartesian product, last dimension fastest
    jobs = expand_sweeps(["a=1,2", "b=x,y"])
    assert jobs == [["a=1", "b=x"], ["a=1", "b=y"],
                    ["a=2", "b=x"], ["a=2", "b=y"]]


def test_interpolating_missing_value_is_missing():
    """A string interpolating a ??? is itself missing (OmegaConf parity):
    it surfaces as MissingMandatoryValue on access / None via .get — never
    as a literal '???' leaking into run-directory paths."""
    from wav2vecsegmenter_tpu.config.config import Config, resolve

    cfg = resolve(Config({"outputs": "???",
                          "run_dir": "${outputs}/infer_outputs"}))
    assert cfg.get("run_dir") is None
    with pytest.raises(MissingMandatoryValue):
        _ = cfg.run_dir


def test_inference_run_dir_without_outputs_fails_cleanly(tmp_path, monkeypatch):
    """`python inference.py ckpt=foo` (no outputs=) must raise
    MissingMandatoryValue without creating a junk '???' directory tree."""
    from wav2vecsegmenter_tpu.cli import inference

    monkeypatch.chdir(tmp_path)
    with pytest.raises(MissingMandatoryValue):
        inference.main(["ckpt=foo"])
    assert not list(tmp_path.iterdir())


def test_single_run_rejects_comma_sweep():
    """Hydra parity: a choice sweep without -m errors up front instead of
    passing '0.2,0.8' as a literal string into the run."""
    from wav2vecsegmenter_tpu.cli.common import parse_cli

    with pytest.raises(ValueError, match="multirun"):
        parse_cli(["algorithm.threshold=0.2,0.8"])
    # commas inside yaml lists are not sweeps
    multirun, ov = parse_cli(["st_metrics=[bleu,bertscore]"])
    assert not multirun and ov == ["st_metrics=[bleu,bertscore]"]
    # with -m the same value IS a sweep
    multirun, ov = parse_cli(["-m", "algorithm.threshold=0.2,0.8"])
    assert multirun


def test_console_entry_points_return_none(monkeypatch):
    """setuptools wraps entry points in sys.exit(...): console() must
    swallow main()'s data return so successful runs exit 0."""
    import wav2vecsegmenter_tpu.cli.inference as mod

    monkeypatch.setattr(mod, "main", lambda: [{"wav": "x"}])
    assert mod.console() is None
