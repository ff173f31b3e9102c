"""Batch inference CLI: checkpoint from a training outputs dir ->
custom_segments.yaml over a wav directory.

Usage (same surface as reference inference.py:156-193, incl. ``-m``
multirun sweeps and per-override run dirs from the conf hydra block):

    python inference.py outputs=/path/to/run ckpt=epoch-15_best_eval_f1 \
        algorithm=dac infer_data=mustc_ende_tst-COMMON [key=value ...]
    python inference.py -m ... algorithm.max_segment_length=10,12,14 ...
"""

from __future__ import annotations

from pathlib import Path

import yaml

from ..config import load_config, merge
from .common import (
    apply_runtime,
    build_model,
    compose_app,
    expand_sweeps,
    init_logging,
    load_params,
    logger,
    parse_cli,
    segment_wavs,
    wavs_from_dir,
)


def resolve_ckpt_path(config) -> str:
    """outputs/exp_name/ckpts/ckpt (reference inference.py:46-49)."""
    p = Path(config.outputs) / config.exp_name / "ckpts" / str(config.ckpt)
    if p.exists():
        return str(p)
    # also accept a direct path
    if Path(str(config.ckpt)).exists():
        return str(config.ckpt)
    raise FileNotFoundError(f"checkpoint not found: {p}")


def generate(config) -> list[dict]:
    """Shared by inference.py and inference_st_pipe.py
    (reference inference.py:26-131)."""
    compute_dtype = apply_runtime(config)
    model, vocab = build_model(config)
    params = load_params(config, model, resolve_ckpt_path(config))
    return segment_wavs(
        config, model, params, vocab, wavs_from_dir(config), compute_dtype
    )


def merge_base(config):
    """Merge the training run's saved config under the CLI config
    (reference inference_st_pipe.py:55-57)."""
    if config.get("base_cfg"):
        base = Path(config.base_cfg) / "config.yaml"
        if base.exists():
            config = merge(load_config(base), config)
    return config


def compose_with_base(overrides: list[str]):
    """Single-run compose (kept for in-process callers/tests)."""
    config, _ = compose_app("inference", overrides)
    return merge_base(config)


def resolve_run(overrides: list[str], multirun: bool):
    """(config, results_path) for one job: hydra run/sweep dir resolution
    + base-config merge; ``results_path`` override wins."""
    config, run_dir = compose_app("inference", overrides, multirun)
    config = merge_base(config)
    out_dir = Path(config.get("results_path") or run_dir
                   or Path(config.outputs) / "infer_outputs")
    return config, out_dir


def main(argv: list[str] | None = None):
    """Single run returns the yaml rows; ``-m`` multirun returns one list
    per sweep job."""
    multirun, overrides = parse_cli(argv)
    if not multirun:
        return _run_job(overrides, multirun=False)
    return [_run_job(job, multirun=True)
            for job in expand_sweeps(overrides)]


def _run_job(overrides: list[str], multirun: bool) -> list[dict]:
    config, out_dir = resolve_run(overrides, multirun)
    out_dir.mkdir(parents=True, exist_ok=True)
    init_logging(config, str(out_dir / "log"))

    # run config + results to wandb (reference inference.py:171-186)
    from ..core.wandblog import init_wandb

    run = init_wandb(
        config, out_dir,
        name="/".join([str(config.get("exp_name", "infer")), out_dir.name]),
    )

    yaml_content = generate(config)
    logger.info("n_segments: %d", len(yaml_content))
    if run is not None:
        run.log({"n_segments": len(yaml_content)}, step=0)
        run.finish()
    with open(out_dir / config.cust_seg_yaml, "w") as f:
        yaml.dump(yaml_content, f, default_flow_style=True)
    return yaml_content


def console() -> None:
    """setuptools console entry point: main() returns run data for
    in-process callers; discard it so ``sys.exit(console())`` exits 0."""
    main()


if __name__ == "__main__":
    main()
