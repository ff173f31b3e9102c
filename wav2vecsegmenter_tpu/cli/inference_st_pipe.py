"""End-to-end ST pipeline CLI: segment -> fairseq translate -> mWER align ->
BLEU/BERTScore/BLEURT.

Usage (same surface as reference inference_st_pipe.py:53-214, incl. the
``-m`` multirun parameter-search workflow from the README and per-override
run dirs from the conf hydra block):

    python inference_st_pipe.py outputs=/path/to/run ckpt=... algorithm=dac \
        infer_data=mustc_ende_tst-COMMON [key=value ...]
    python inference_st_pipe.py -m ... algorithm.max_segment_length=10,12 ...
"""

from __future__ import annotations

from ..stpipe.eval_st import eval_st
from .common import expand_sweeps, init_logging, logger, parse_cli
from .inference import generate, resolve_run


def main(argv: list[str] | None = None):
    """Single run returns the results dict; ``-m`` multirun returns one
    dict per sweep job."""
    multirun, overrides = parse_cli(argv)
    if not multirun:
        return _run_job(overrides, multirun=False)
    return [_run_job(job, multirun=True)
            for job in expand_sweeps(overrides)]


def _run_job(overrides: list[str], multirun: bool) -> dict:
    config, results_path = resolve_run(overrides, multirun)
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


def console() -> None:
    """setuptools console entry point: main() returns run data for
    in-process callers; discard it so ``sys.exit(console())`` exits 0."""
    main()


if __name__ == "__main__":
    main()
