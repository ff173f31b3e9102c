"""Training-loss parity vs the reference formulation in torch: same weights,
same batch => same masked BCE (+pos_weight, +MA weighting) loss value."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from wav2vecsegmenter_tpu.checkpoints.torch_convert import (
    convert_hf_wav2vec2,
    convert_torch_sfc,
)
from wav2vecsegmenter_tpu.train.loss import BCEWithLogitsLoss
from wav2vecsegmenter_tpu.train.step import compute_bce_loss

from .helpers import tiny_shas
from .test_model_parity import make_hf_model, our_cfg


@pytest.mark.parametrize("pos_weight,ma_window_steps", [(None, 0), (0.93, 0),
                                                        (0.8, 5)])
def test_masked_bce_loss_matches_torch(rng, pos_weight, ma_window_steps):
    """Loss math only (logits given): masking, pos_weight, MA weighting, and
    the per-sequence-sum-then-batch-mean reduction (reference
    train.py:408-454)."""
    b, t = 4, 120
    logits = rng.randn(b, t).astype(np.float32) * 2
    target = (rng.rand(b, t) > 0.6).astype(np.float32)
    out_lens = np.array([120, 100, 80, 120])
    out_mask = np.arange(t)[None, :] < out_lens[:, None]

    # torch reference formulation
    tl = torch.nn.BCEWithLogitsLoss(
        reduction="none",
        pos_weight=None if pos_weight is None else torch.tensor(pos_weight),
    )
    lpp = tl(torch.from_numpy(logits), torch.from_numpy(target))
    lpp[~torch.from_numpy(out_mask)] = 0
    if ma_window_steps:
        from wav2vecsegmenter_tpu.algorithms import moving_average

        tgt_ma = np.stack([moving_average(target[i], ma_window_steps)
                           for i in range(b)]).astype(np.float32)
        weight = 1 - torch.abs(torch.from_numpy(target) -
                               torch.from_numpy(tgt_ma))
        lpp = lpp * weight
    torch_loss = lpp.sum(dim=1).mean().item()

    ours = float(compute_bce_loss(
        jnp.asarray(logits), jnp.asarray(target), jnp.asarray(out_mask),
        BCEWithLogitsLoss(pos_weight), ma_window_steps,
    ))
    assert ours == pytest.approx(torch_loss, rel=1e-5)


def test_full_model_loss_matches_torch(rng):
    """Forward + loss through converted weights: the value the optimizer sees
    matches the reference's end to end."""
    hf_model, _ = make_hf_model(True, real_geometry=True)
    hf_model.encoder.layer_norm = torch.nn.Identity()
    torch.manual_seed(13)
    enc_layer = torch.nn.TransformerEncoderLayer(
        64, nhead=4, activation="gelu", batch_first=True, norm_first=True)
    head = torch.nn.ModuleDict({
        "transformer": torch.nn.TransformerEncoder(enc_layer, num_layers=1),
        "layer_norm": torch.nn.LayerNorm(64),
        "output_layer": torch.nn.Linear(64, 1),
    })
    hf_model.eval()
    head.eval()

    import dataclasses

    from .helpers import TINY_W2V

    model = tiny_shas()
    model.w2v_cfg = dataclasses.replace(TINY_W2V, num_layers=3,
                                        apply_spec_augment=False)
    params = {
        "wav2vec": convert_hf_wav2vec2(hf_model.state_dict(), model.w2v_cfg),
        "seg": convert_torch_sfc(head.state_dict(), 1),
    }

    from wav2vecsegmenter_tpu.core.frames import conv_output_length

    b, L = 2, 32000
    t_out = int(conv_output_length(L))  # 99: keep torch/jax widths aligned
    audio = rng.randn(b, L).astype(np.float32)
    lens = np.full(b, L, np.int32)
    in_mask = np.ones((b, L), np.int64)
    target = (rng.rand(b, t_out) > 0.6).astype(np.float32)
    out_mask = np.ones((b, t_out), bool)

    with torch.no_grad():
        h = hf_model(torch.from_numpy(audio),
                     attention_mask=torch.from_numpy(in_mask)).last_hidden_state
        if h.shape[1] > t_out:
            h = h[:, :t_out]
        hh = head["transformer"](
            h, src_key_padding_mask=torch.from_numpy(~out_mask))
        tlogits = head["output_layer"](head["layer_norm"](hh)).squeeze(-1)
        lpp = torch.nn.BCEWithLogitsLoss(reduction="none")(
            tlogits, torch.from_numpy(target))
        torch_loss = lpp.sum(dim=1).mean().item()

    jlogits = model.apply(params, jnp.asarray(audio), jnp.asarray(lens),
                          jnp.asarray(out_mask))
    ours = float(compute_bce_loss(
        jlogits, jnp.asarray(target), jnp.asarray(out_mask),
        BCEWithLogitsLoss(None), 0,
    ))
    assert ours == pytest.approx(torch_loss, rel=2e-4)
