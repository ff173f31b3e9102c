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


def test_greedy_decode_matches_teacher_forced_forward(rng):
    """KV-cached greedy decode == full causal forward fed the decoded
    tokens: per-position logits must agree (same math, different caching)."""
    vocab = BaseVocabulary()
    model = tiny_autoreg()
    params = model.init(jax.random.PRNGKey(0))

    b, L, t_out = 2, 16000, 30
    audio = rng.randn(b, L).astype(np.float32)
    in_lengths = np.array([L, L - 4000], np.int32)

    probs, logits, tokens = model.greedy_decode(
        params, jnp.asarray(audio), jnp.asarray(in_lengths), t_out)
    probs, logits, tokens = map(np.asarray, (probs, logits, tokens))
    assert probs.shape == (b, t_out)
    assert logits.shape == (b, t_out, 4)
    assert tokens.shape == (b, t_out)
    assert ((probs >= 0) & (probs <= 1)).all()
    assert np.isin(tokens, [vocab.boundary_token_id,
                            vocab.nonboundary_token_id]).all()
    # greedy consistency: token == argmax over the {B, NB} logit pair
    pair = logits[:, :, [vocab.boundary_token_id, vocab.nonboundary_token_id]]
    np.testing.assert_array_equal(tokens, pair.argmax(-1).astype(tokens.dtype))

    # full teacher-forced forward on the decoded prefix
    in_target = np.concatenate(
        [np.full((b, 1), vocab.sep_token_id, np.int32), tokens[:, :-1]], 1)
    tf_logits = np.asarray(model.apply(
        params, jnp.asarray(audio), jnp.asarray(in_lengths),
        jnp.asarray(in_target),
        jnp.ones((b, t_out), bool), jnp.ones((b, t_out), bool)))
    np.testing.assert_allclose(logits, tf_logits, atol=2e-4, rtol=1e-4)


def test_autoreg_window_inference_pipeline(rng):
    """The product inference path dispatches to greedy_decode for the arseg
    task and stitches talk probabilities (closes the reference's
    NotImplementedError at lib/evaluate.py:50)."""
    from wav2vecsegmenter_tpu.data.collate import Batch
    from wav2vecsegmenter_tpu.infer.pipeline import WindowInference, infer_talk

    model = tiny_autoreg()
    params = model.init(jax.random.PRNGKey(0))
    engine = WindowInference(model, params, loss_tag="ce")

    b, L, t_out = 2, 16000, 50
    batch = Batch(
        audio=rng.randn(b, L).astype(np.float32),
        in_lengths=np.full(b, L, np.int32),
        out_mask=np.ones((b, t_out), bool),
        target=None,
        starts=np.arange(b) * t_out,
        ends=(np.arange(b) + 1) * t_out,
        included=np.ones(b, bool),
    )
    talk_probs, talk_logits, _ = infer_talk(
        engine, [batch], duration_outframes=2 * t_out)
    assert talk_probs.shape == (2 * t_out,)
    assert np.isfinite(talk_probs).all()
    assert ((talk_probs >= 0) & (talk_probs <= 1)).all()
    assert talk_logits.shape == (2 * t_out, 4)


def test_autoreg_training_dropout_fires(rng):
    """Reference parity: the seg encoder-decoder trains WITH dropout
    (init_dropout on src + torch layer-default 0.1 in every sublayer,
    lib/models.py:100-123) — train-mode apply must differ from the
    deterministic forward and between rng keys; deterministic stays exact."""
    model = tiny_autoreg()
    model.init_dropout = 0.1
    params = model.init(jax.random.PRNGKey(0))

    b, L, t = 2, 16000, 20
    audio = jnp.asarray(rng.randn(b, L).astype(np.float32))
    lens = jnp.asarray(np.full(b, L, np.int32))
    tgt = jnp.asarray(np.ones((b, t), np.int32))
    m = jnp.ones((b, t), bool)

    det1 = np.asarray(model.apply(params, audio, lens, tgt, m, m))
    det2 = np.asarray(model.apply(params, audio, lens, tgt, m, m,
                                  deterministic=True,
                                  rng=jax.random.PRNGKey(7)))
    np.testing.assert_array_equal(det1, det2)

    tr1 = np.asarray(model.apply(params, audio, lens, tgt, m, m,
                                 deterministic=False,
                                 rng=jax.random.PRNGKey(1)))
    tr2 = np.asarray(model.apply(params, audio, lens, tgt, m, m,
                                 deterministic=False,
                                 rng=jax.random.PRNGKey(2)))
    assert np.isfinite(tr1).all() and np.isfinite(tr2).all()
    assert np.abs(tr1 - det1).max() > 1e-4
    assert np.abs(tr1 - tr2).max() > 1e-4
