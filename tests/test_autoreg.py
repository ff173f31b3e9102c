"""Autoregressive segmenter: collate contract + train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2vecsegmenter_tpu.data.collate import collate_autoreg
from wav2vecsegmenter_tpu.data.vocab import BaseVocabulary
from wav2vecsegmenter_tpu.models.autoreg import AutoRegSegmenterImpl
from wav2vecsegmenter_tpu.train.loss import CrossEntropyLoss
from wav2vecsegmenter_tpu.train.step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

from .helpers import TINY_W2V


def tiny_autoreg():
    model = AutoRegSegmenterImpl(
        wav2vec_keep_layers=2,
        n_transformer_enc_layers=1,
        n_transformer_enc_heads=4,
        n_transformer_dec_layers=2,
        n_transformer_dec_heads=4,
        init_dropout=0.0,
        vocab_size=4,
    )
    model.w2v_cfg = TINY_W2V
    model.d_model = TINY_W2V.hidden_size
    return model


def test_collate_autoreg_contract(rng):
    vocab = BaseVocabulary()
    examples = []
    for i in range(2):
        wav = rng.randn(16000).astype(np.float32) * 0.1
        tgt = (rng.rand(48) > 0.5).astype(np.float32)
        examples.append((wav, tgt, i * 50, i * 50 + 48))
    b = collate_autoreg(examples, 3, 16000, 50,
                        vocab.pad_token_id, vocab.sep_token_id)
    # SEP-led input, SEP-tailed output, teacher forcing shift
    assert b.in_target.shape == (3, 51) and b.out_target.shape == (3, 51)
    assert b.in_target[0, 0] == vocab.sep_token_id
    assert b.out_target[0, 48] == vocab.sep_token_id
    np.testing.assert_array_equal(b.in_target[0, 1:49], b.out_target[0, :48])
    # masks: tgt covers len+1 (head SEP + frames), src drops the head SEP
    assert b.tgt_mask[0].sum() == 49
    assert b.src_mask[0].sum() == 48
    # padding row
    assert not b.included[2]
    assert (b.in_target[2] == vocab.pad_token_id).all()


def test_autoreg_train_step_runs(rng):
    vocab = BaseVocabulary()
    model = tiny_autoreg()
    params = model.init(jax.random.PRNGKey(0))
    mask = model.trainable_mask(params)
    opt = make_optimizer(1e-3, 50, 1, mask)
    state = init_train_state(model, opt, jax.random.PRNGKey(1), params)
    loss_fn = CrossEntropyLoss(ignore_index=vocab.pad_token_id)
    step = make_train_step(model, loss_fn, "ce", 0, opt, vocab=vocab,
                           autoregression=True)

    examples = []
    for i in range(2):
        wav = rng.randn(16000).astype(np.float32) * 0.1
        tgt = np.zeros(48, np.float32)
        tgt[:24] = 1.0
        examples.append((wav, tgt, i * 50, i * 50 + 48))
    b = collate_autoreg(examples, 2, 16000, 50,
                        vocab.pad_token_id, vocab.sep_token_id)
    batch = {
        "audio": jnp.asarray(b.audio),
        "in_lengths": jnp.asarray(b.in_lengths),
        "in_target": jnp.asarray(b.in_target),
        "out_target": jnp.asarray(b.out_target),
        "src_mask": jnp.asarray(b.src_mask),
        "tgt_mask": jnp.asarray(b.tgt_mask),
    }
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
