"""End-to-end ST pipeline CLI: segment -> fairseq translate -> mWER align ->
BLEU/BERTScore/BLEURT.

Usage (same surface as reference inference_st_pipe.py:53-214):

    python inference_st_pipe.py outputs=/path/to/run ckpt=... algorithm=dac \
        infer_data=mustc_ende_tst-COMMON [key=value ...]
"""

from __future__ import annotations

from pathlib import Path

from ..stpipe.eval_st import eval_st
from .common import init_logging, logger, parse_overrides
from .inference import compose_with_base, generate

CONF_DIR = Path(__file__).resolve().parents[2] / "conf"


def main(argv: list[str] | None = None) -> dict:
    overrides = parse_overrides(argv)
    config = compose_with_base(overrides)
    results_path = Path(config.get("results_path") or
                        Path(config.outputs) / "infer_outputs")
    results_path.mkdir(parents=True, exist_ok=True)
    init_logging(config, str(results_path / "log"))

    # sweep-analysis wandb artifacts (reference inference_st_pipe.py:69-78,
    # 162-213): run named exp/<override-dirname>, metric result tables
    from ..core.wandblog import init_wandb, st_results_tables

    wandb_name = "/".join(
        [str(config.get("exp_name", "st_pipe")), results_path.name])
    run = init_wandb(config, results_path, name=wandb_name)

    yaml_content = generate(config)
    algorithm = config.algorithm.tag
    results = eval_st(config, yaml_content, results_path, algorithm,
                      cmd_style="cli")
    logger.info("ST results: %s", results)
    if run is not None:
        st_results_tables(run, wandb_name, results, algorithm,
                          extra={"n_segments": len(yaml_content)})
        run.finish()
    return results


if __name__ == "__main__":
    main()
