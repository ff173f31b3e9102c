#!/usr/bin/env python
"""Measure the effect of omitting attention-prob dropout during fine-tuning.

The fused attention kernel does not implement attention-prob dropout
(models/wav2vec2.py::_mha); HF applies attention_dropout=0.1 when the
reference fine-tunes (lib/models.py uses HF Wav2Vec2 defaults).  PARITY.md
claims the omission is statistical noise — this script replaces that
assertion with data: N seeded short fine-tunes per arm (with / without
prob dropout on the explicit XLA path), comparing end-of-run training loss
against the across-seed spread.

Runs on CPU (tiny config) in ~2 min:
    python scripts/measure_attn_dropout.py
"""

import dataclasses
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wav2vecsegmenter_tpu.models.shas import SHAS  # noqa: E402
from wav2vecsegmenter_tpu.models.wav2vec2 import Wav2Vec2Config  # noqa: E402
from wav2vecsegmenter_tpu.train.loss import BCEWithLogitsLoss  # noqa: E402
from wav2vecsegmenter_tpu.train.step import (  # noqa: E402
    init_train_state, make_optimizer, make_train_step)

N_SEEDS = 6
N_STEPS = 60
TAIL = 10  # average the last TAIL step losses


def make_model(prob_dropout: bool) -> SHAS:
    model = SHAS(wav2vec_keep_layers=2, finetune_wav2vec=True,
                 wav2vec_ft_layers=2, n_transformer_enc_layers=1,
                 n_transformer_enc_heads=4, init_dropout=0.1)
    model.w2v_cfg = Wav2Vec2Config(
        hidden_size=64, num_layers=2, num_heads=4, ffn_dim=128,
        conv_dim=(32,) * 7, conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        apply_attention_prob_dropout=prob_dropout,
    )
    model.d_model = 64
    model.keep_layers = 2
    return model


def run_arm(prob_dropout: bool, seed: int) -> float:
    model = make_model(prob_dropout)
    params = model.init(jax.random.PRNGKey(seed))
    mask = model.trainable_mask(params)
    opt = make_optimizer(1e-3, N_STEPS, 1, mask)
    state = init_train_state(model, opt, jax.random.PRNGKey(seed), params)
    step = make_train_step(model, BCEWithLogitsLoss(None), "bce", 0, opt)

    rng = np.random.RandomState(seed)
    b, L, t_out = 4, 32000, 99
    target = np.zeros((b, t_out), np.float32)
    target[:, : t_out // 2] = 1.0
    batch = {
        "audio": jnp.asarray(rng.randn(b, L).astype(np.float32) * 0.1),
        "in_lengths": jnp.full(b, L, jnp.int32),
        "target": jnp.asarray(target),
        "out_mask": jnp.ones((b, t_out), bool),
    }
    key = jax.random.PRNGKey(1000 + seed)
    losses = []
    for i in range(N_STEPS):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
    return float(np.mean(losses[-TAIL:]))


def main():
    results = {}
    for arm, flag in [("no_prob_dropout", False), ("prob_dropout", True)]:
        finals = [run_arm(flag, s) for s in range(N_SEEDS)]
        results[arm] = finals
        print(f"{arm:>18}: finals={['%.4f' % f for f in finals]} "
              f"mean={np.mean(finals):.4f} std={np.std(finals):.4f}")
    a, b = np.array(results["no_prob_dropout"]), np.array(results["prob_dropout"])
    diff = a.mean() - b.mean()
    pooled = np.sqrt((a.std() ** 2 + b.std() ** 2) / 2)
    print(f"mean diff = {diff:+.4f} ({diff / max(pooled, 1e-12):+.2f} pooled "
          f"seed-stds) — |diff| << seed spread supports the PARITY.md claim")


if __name__ == "__main__":
    main()
