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

from ..config import compose, load_config, merge
from .common import (
    apply_runtime,
    build_model,
    init_logging,
    load_params,
    logger,
    parse_overrides,
    segment_wavs,
    wavs_from_yaml,
)

CONF_DIR = Path(__file__).resolve().parents[2] / "conf"


def main(argv: list[str] | None = None) -> list[dict]:
    overrides = parse_overrides(argv)
    config = compose(CONF_DIR, "segment", overrides)

    if config.get("config_path"):
        prev = load_config(config.config_path)
        config = merge(prev, config)

    output_dir = Path(config.output_dir)
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


if __name__ == "__main__":
    main()
