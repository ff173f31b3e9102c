"""Batch inference CLI: checkpoint from a training outputs dir ->
custom_segments.yaml over a wav directory.

Usage (same surface as reference inference.py:156-193):

    python inference.py outputs=/path/to/run ckpt=epoch-15_best_eval_f1 \
        algorithm=dac infer_data=mustc_ende_tst-COMMON [key=value ...]
"""

from __future__ import annotations

from pathlib import Path

import yaml

from ..config import compose, load_config, merge
from .common import (
    apply_runtime,
    build_model,
    init_logging,
    load_params,
    logger,
    parse_overrides,
    segment_wavs,
    wavs_from_dir,
)

CONF_DIR = Path(__file__).resolve().parents[2] / "conf"


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


def compose_with_base(overrides: list[str]):
    config = compose(CONF_DIR, "inference", overrides)
    if config.get("base_cfg"):
        base = Path(config.base_cfg) / "config.yaml"
        if base.exists():
            config = merge(load_config(base), config)
    return config


def main(argv: list[str] | None = None) -> list[dict]:
    overrides = parse_overrides(argv)
    config = compose_with_base(overrides)
    out_dir = Path(config.get("results_path") or
                   Path(config.outputs) / "infer_outputs")
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


if __name__ == "__main__":
    main()
