"""SSL/CTC variant parity: SHASWithSSL vs HF Wav2Vec2ForCTC + torch head."""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from wav2vecsegmenter_tpu.checkpoints.torch_convert import (
    convert_hf_for_ctc,
    convert_reference_checkpoint,
    convert_torch_sfc,
)
from wav2vecsegmenter_tpu.models.shas import SHASWithSSL

from .test_model_parity import SMALL


def make_hf_ctc(vocab_size=32):
    cfg = transformers.Wav2Vec2Config(
        **SMALL,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        conv_bias=True,
        vocab_size=vocab_size,
    )
    torch.manual_seed(4)
    model = transformers.Wav2Vec2ForCTC(cfg)
    model.eval()
    return model


def tiny_ssl():
    from .test_model_parity import our_cfg

    m = SHASWithSSL(
        n_transformer_enc_layers=1,
        n_transformer_enc_heads=4,
        init_dropout=0.0,
        vocab_size=36,
        ctc_vocab_size=32,
    )
    m.w2v_cfg = our_cfg(True)
    m.d_model = 64
    return m


def test_ssl_forward_matches_hf_ctc(rng):
    hf = make_hf_ctc()
    model = tiny_ssl()

    torch.manual_seed(17)
    enc_layer = torch.nn.TransformerEncoderLayer(
        64, nhead=4, activation="gelu", batch_first=True, norm_first=True)
    head = torch.nn.ModuleDict({
        "transformer": torch.nn.TransformerEncoder(enc_layer, num_layers=1),
        "layer_norm": torch.nn.LayerNorm(64),
        "output_layer": torch.nn.Linear(64, 36),
    })
    head.eval()

    params = convert_hf_for_ctc(hf.state_dict(), model.w2v_cfg)
    params["seg"] = convert_torch_sfc(head.state_dict(), 1)

    b, L = 2, 2000
    audio = rng.randn(b, L).astype(np.float32)
    lengths = np.array([2000, 1500], np.int32)
    in_mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.int64)

    with torch.no_grad():
        s = hf(torch.from_numpy(audio),
               attention_mask=torch.from_numpy(in_mask),
               output_hidden_states=True)
        t_ctc = s.logits.numpy()
        t_hidden = s.hidden_states[-1]

    t_conv = t_ctc.shape[1]
    out_lens = np.minimum(
        np.array([t_conv, int(t_conv * 1500 / 2000)]), t_conv)
    out_mask = np.arange(t_conv)[None, :] < out_lens[:, None]

    with torch.no_grad():
        hh = head["transformer"](
            t_hidden, src_key_padding_mask=torch.from_numpy(~out_mask))
        t_frame = head["output_layer"](head["layer_norm"](hh)).numpy()

    j_ctc, j_frame = model.apply(
        params, jnp.asarray(audio), jnp.asarray(lengths),
        jnp.asarray(out_mask))

    fm = np.arange(t_conv)[None, :] < np.array([199, 149])[:, None]
    d_ctc = np.abs(np.asarray(j_ctc) - t_ctc)[fm]
    assert d_ctc.max() < 2e-4, f"ctc diff {d_ctc.max()}"
    d_frame = np.abs(np.asarray(j_frame) - t_frame)[out_mask]
    assert d_frame.max() < 2e-4, f"frame diff {d_frame.max()}"


def test_ssl_reference_full_layout_conversion():
    """Full-layout SSL .pt (wav2vec_model.model.wav2vec2.* nesting) converts."""
    hf = make_hf_ctc()
    torch.manual_seed(18)
    enc_layer = torch.nn.TransformerEncoderLayer(
        64, nhead=4, activation="gelu", batch_first=True, norm_first=True)
    head = torch.nn.ModuleDict({
        "transformer": torch.nn.TransformerEncoder(enc_layer, num_layers=1),
        "layer_norm": torch.nn.LayerNorm(64),
        "output_layer": torch.nn.Linear(64, 36),
    })
    sd = {}
    for k, v in hf.state_dict().items():
        sd[f"wav2vec_model.model.{k}"] = v
    for k, v in head.state_dict().items():
        sd[f"seg_model.{k}"] = v

    model = tiny_ssl()
    params = convert_reference_checkpoint(sd, model)
    assert set(params) == {"wav2vec", "final_ln", "lm_head", "seg"}
    np.testing.assert_allclose(
        np.asarray(params["lm_head"]["w"]),
        hf.lm_head.weight.detach().numpy().T, rtol=1e-6)
