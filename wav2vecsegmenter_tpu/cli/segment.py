"""Standalone segmentation CLI: wav dir -> custom_segments.yaml.

Usage (same surface as reference segment.py:159-177):

    python segment.py ckpt_path=/path/ckpt.pt config_path=/path/config.yaml \
        output_dir=/path/out [algorithm=dac] [infer_data=...] [key=value ...]

The training run's saved config is merged under the CLI config
(reference segment.py:161-163).
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
    wavs_from_yaml,
)


def main(argv: list[str] | None = None):
    """Single run returns the yaml rows; ``-m`` multirun returns one list
    per sweep job (hydra CLI surface, reference segment.py:159 + conf
    hydra block)."""
    multirun, overrides = parse_cli(argv)
    if not multirun:
        return _run_job(overrides, multirun=False)
    return [_run_job(job, multirun=True)
            for job in expand_sweeps(overrides)]


def _run_job(overrides: list[str], multirun: bool) -> list[dict]:
    config, run_dir = compose_app("segment", overrides, multirun)

    if config.get("config_path"):
        prev = load_config(config.config_path)
        config = merge(prev, config)

    # reference semantics: the hydra run dir (output_dir/<override_dirname>)
    # is the CWD every artifact lands in; results_path overrides it
    output_dir = Path(config.get("results_path") or run_dir
                      or config.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    init_logging(config, str(output_dir / "log"))
    logger.info("Output directory : [%s]", output_dir)

    compute_dtype = apply_runtime(config)
    model, vocab = build_model(config)
    params = load_params(config, model, config.ckpt_path)

    wav_paths = wavs_from_yaml(config)
    yaml_content = segment_wavs(
        config, model, params, vocab, wav_paths, compute_dtype
    )

    logger.info("Number of segments: %d", len(yaml_content))
    cust_seg_yaml = output_dir / config.cust_seg_yaml
    with open(cust_seg_yaml, "w") as f:
        yaml.dump(yaml_content, f, default_flow_style=True)
    logger.info("Saved to [%s].", cust_seg_yaml)
    return yaml_content


def console() -> None:
    """setuptools console entry point: main() returns run data for
    in-process callers; discard it so ``sys.exit(console())`` exits 0."""
    main()


if __name__ == "__main__":
    main()
