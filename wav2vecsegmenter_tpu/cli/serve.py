"""Segmentation serving daemon — `w2vseg-serve`.

Listens on TCP (``host``/``port``) or a unix socket (``unix_path``) and
serves live PCM connections through one batched encoder
(infer/server.SegmentationServer over MultiStreamSegmenter): clients send
a JSON header line + raw s16le mono 16 kHz PCM and receive a JSON line
per committed segment as it finalizes.  Wire protocol and semantics:
infer/server.py docstring.

    w2vseg-serve ckpt_path=... config_path=... algorithm=pthr port=7957

No reference counterpart (the reference has no serving path); the
segmentation semantics are exactly the offline algorithms' (causal ones:
strm / pthr+MA).
"""

from __future__ import annotations

import json

from ..config import load_config, merge, to_plain
from ..infer.pipeline import WindowInference
from ..infer.server import SegmentationServer
from .common import (
    apply_runtime,
    build_model,
    compose_app,
    hop_conf,
    init_logging,
    load_params,
    logger,
    parse_cli,
)


def build_server(config) -> SegmentationServer:
    """Compose the model/engine from config and bind the listening socket
    (does not serve yet — callers run serve_forever())."""
    compute_dtype = apply_runtime(config)
    model, vocab = build_model(config)
    params = load_params(config, model, config.ckpt_path)
    engine = WindowInference(
        model, params, loss_tag=config.task.loss.tag,
        compute_dtype=compute_dtype, vocab=vocab,
        quantize=(config.get("runtime") or {}).get("quantize"),
        precision=(config.get("runtime") or {}).get("precision"),
    )

    algo_conf = to_plain(config.algorithm)
    tag = algo_conf.pop("tag")
    if tag not in ("strm", "pthr"):
        raise NotImplementedError(
            f"online serving needs a causal algorithm (strm/pthr), got "
            f"'{tag}' — pDAC needs the whole talk; use the offline CLIs")

    return SegmentationServer(
        engine,
        host=str(config.get("host", "127.0.0.1")),
        port=int(config.get("port", 0)),
        unix_path=config.get("unix_path") or None,
        max_batch=int(config.get("max_batch", 8)),
        stats_every_s=float(config.get("stats_every_s", 60.0)),
        max_conns=int(config.get("max_conns", 0)),
        segment_length=float(config.segment_length),
        algorithm=tag,
        **hop_conf(config),
        **algo_conf,
    )


def main(argv: list[str] | None = None):
    multirun, overrides = parse_cli(argv)
    if multirun:
        raise ValueError("w2vseg-serve does not support -m multirun")
    config, run_dir = compose_app("serve", overrides, multirun=False)
    if config.get("config_path"):
        prev = load_config(config.config_path)
        config = merge(prev, config)
    init_logging(config, "serve.log")

    server = build_server(config)
    # machine-readable bind line so wrappers can discover an ephemeral port
    print(json.dumps({"type": "listening", "address": server.address}),
          flush=True)
    logger.info("serving on %s", server.address)

    # graceful shutdown: SIGTERM/SIGINT stop the loop; serve_forever then
    # drains every active stream (tail flush + end line) before closing
    import signal

    def _stop(signum, frame):
        logger.info("signal %d: draining active streams", signum)
        server.shutdown()

    try:
        signal.signal(signal.SIGTERM, _stop)
        signal.signal(signal.SIGINT, _stop)
    except ValueError:
        pass  # not the main thread (embedded use): rely on shutdown()
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down")
        server.drain()
        server.close()


def console() -> None:
    """setuptools console entry point."""
    main()


if __name__ == "__main__":
    main()
