"""Training CLI.

Usage (same surface as reference train.py):

    python train.py exp_name=myrun batch_size=4 task=shas \
        task.model.finetune_wav2vec=True data=mustc_ende [key=value ...]
"""

from __future__ import annotations

from pathlib import Path

from ..config import compose, save_config
from ..train.loop import train
from .common import init_logging, parse_overrides

CONF_DIR = Path(__file__).resolve().parents[2] / "conf"


def main(argv: list[str] | None = None) -> dict:
    overrides = parse_overrides(argv)
    config = compose(CONF_DIR, "train", overrides)
    init_logging(config)
    # dump the composed config for inference-time merging
    # (.hydra/config.yaml contract, reference segment.py:161-163)
    hydra_dir = Path(config.exp_name) / ".hydra"
    save_config(config, hydra_dir / "config.yaml")
    return train(config)


def console() -> None:
    """setuptools console entry point: main() returns run data for
    in-process callers; discard it so ``sys.exit(console())`` exits 0."""
    main()


if __name__ == "__main__":
    main()
