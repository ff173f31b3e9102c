"""Frame-level evaluation: dev-set micro/binary F1, precision, recall.

Replicates reference lib/evaluate.py:130-214 — per talk, average probs over
``inference_times`` shifted window grids, threshold, accumulate preds/targets
over all talks, then sklearn metrics rounded to 4 decimals.  ``eval_f1`` is
the best-checkpoint selection metric (reference conf/train.yaml:16-17).
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import f1_score, precision_score, recall_score

from ..infer.pipeline import WindowInference, collect_talk, dispatch_talk


def evaluate(
    dataloader_generator,
    engine: WindowInference,
    loss_tag: str = "bce",
    vocab=None,
) -> dict[str, float]:
    all_preds = np.array([], dtype=bool)
    all_targets = np.array([])
    all_losses: list[float] = []

    talk_ids = dataloader_generator.get_talk_ids()
    inference_times = dataloader_generator.dataset.inference_times

    from tqdm import tqdm

    def dispatch_one(talk_id):
        """Upload + launch all passes of one talk; duration_outframes is
        captured NOW (the generator mutates its dataset per talk)."""
        passes = []
        for iteration in range(inference_times):
            batches = dataloader_generator.generate(talk_id, iteration)
            passes.append(dispatch_talk(engine, batches))
        return passes, dataloader_generator.dataset.duration_outframes

    # one-talk lookahead: talk N+1's windows upload + forward while talk
    # N's probabilities stream back (same pattern as cli/common.segment_wavs)
    handles = []
    talk_iter = iter(tqdm(talk_ids, desc="eval talks"))
    nxt = next(talk_iter, None)
    if nxt is not None:
        handles.append(dispatch_one(nxt))
    while handles:
        nxt = next(talk_iter, None)
        if nxt is not None:
            handles.append(dispatch_one(nxt))
        passes, duration_outframes = handles.pop(0)
        probs = logits = targets = None
        for pending in passes:
            p, l, t, loss = collect_talk(
                engine, pending, duration_outframes,
                collect_targets=True,
                return_loss=True,
            )
            if loss is not None:
                all_losses.append(loss)
            if probs is None:
                probs, logits, targets = p, l, t
            else:
                probs += p
                logits += l
        probs /= inference_times

        if loss_tag == "bce":
            # NOTE: the reference divides by inference_times a second time
            # here (lib/evaluate.py:185) — with the default inference_times=1
            # this is a no-op; replicated for metric parity.
            preds = probs / inference_times > 0.5
        elif loss_tag in ("ce", "ssl", "ctc"):
            # ctc reuses the ssl frame metrics: the SFC head emits the same
            # multi-class frame logits; under a pure-CTC loss it is untrained
            # (the metric then tracks the backbone adaptation only)
            preds = np.argmax(logits, axis=-1) == vocab.boundary_token_id
            spe_mask = targets != vocab.pad_token_id
            targets = targets * spe_mask
        else:
            raise NotImplementedError(loss_tag)

        all_preds = np.append(all_preds, preds)
        all_targets = np.append(all_targets, targets)

    if hasattr(dataloader_generator.dataset, "release_cache"):
        # the eval dataset outlives this call (train loop reuses it every
        # eval); don't pin the last talks' decoded audio until the next one
        dataloader_generator.dataset.release_cache()

    all_targets = all_targets.astype(bool)
    all_preds = all_preds.astype(bool)
    results_loss = (
        {"eval_loss": float(np.mean(all_losses))} if all_losses else {}
    )
    return {
        **results_loss,
        "eval_accuracy": round(f1_score(all_targets, all_preds, average="micro"), 4),
        "eval_f1": round(f1_score(all_targets, all_preds, average="binary"), 4),
        "eval_precision": round(precision_score(all_targets, all_preds), 4),
        "eval_recall": round(recall_score(all_targets, all_preds), 4),
    }


def train_step_metrics(all_targets, all_preds, all_losses) -> dict:
    """Running train metrics printed every print_every_steps
    (reference train.py:508-527).  With no accumulated predictions (multi-
    host runs keep logits device-sharded and skip frame accumulation) the
    frame metrics report nan rather than crashing sklearn."""
    loss = float(np.mean(all_losses)) if all_losses else float("nan")
    if len(all_preds) == 0:
        nan = float("nan")
        return {"loss": loss, "accuracy": nan, "f1": nan,
                "precision": nan, "recall": nan}
    return {
        "loss": loss,
        "accuracy": f1_score(all_targets, all_preds, average="micro"),
        "f1": f1_score(all_targets, all_preds, average="binary"),
        "precision": precision_score(all_targets, all_preds, zero_division=0),
        "recall": recall_score(all_targets, all_preds, zero_division=0),
    }
