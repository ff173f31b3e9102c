"""FFN-adapter variant parity: torch oracle built per the reference formula
(lib/models.py:371-428) vs our flag-gated adapter path."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from wav2vecsegmenter_tpu.checkpoints.torch_convert import convert_hf_wav2vec2
from wav2vecsegmenter_tpu.models.wav2vec2 import wav2vec2_forward

from .test_model_parity import make_hf_model, our_cfg


class ScaledParallelAdapter(torch.nn.Module):
    """Reference formula: y + scale * up(relu(down(x)))
    (lib/models.py:371-387)."""

    def __init__(self, embed_dim, bottleneck_dim, scaling_factor):
        super().__init__()
        self.down_proj = torch.nn.Linear(embed_dim, bottleneck_dim)
        self.up_proj = torch.nn.Linear(bottleneck_dim, embed_dim)
        self.scaling_factor = scaling_factor

    def forward(self, x, y):
        return y + self.scaling_factor * self.up_proj(
            torch.relu(self.down_proj(x)))


class AdapterLayer(torch.nn.Module):
    """Stable-LN encoder layer with the parallel FFN adapter
    (reference lib/models.py:390-428)."""

    def __init__(self, hf_layer, embed_dim, bottleneck):
        super().__init__()
        self.attention = hf_layer.attention
        self.dropout = hf_layer.dropout
        self.layer_norm = hf_layer.layer_norm
        self.feed_forward = hf_layer.feed_forward
        self.final_layer_norm = hf_layer.final_layer_norm
        self.ffn_adapter = ScaledParallelAdapter(embed_dim, bottleneck, 4)

    def forward(self, hidden_states, attention_mask=None,
                output_attentions=False, **kwargs):
        residual = hidden_states
        h = self.layer_norm(hidden_states)
        h, _, _ = self.attention(h, attention_mask=attention_mask,
                                 output_attentions=True)
        h = self.dropout(h)
        h = residual + h

        ffn_residual = h
        hn = self.final_layer_norm(h)
        ffn_out = self.feed_forward(hn)
        h = self.ffn_adapter(hn, ffn_out)
        h = ffn_residual + h
        return (h,)


def test_adapter_layer_matches_torch(rng):
    import dataclasses

    model, _ = make_hf_model(True)
    model.encoder.layer_norm = torch.nn.Identity()
    # wrap the top layer (of 3) with the adapter, like
    # HFWav2Vec2WithAdapter with keep=3, ft=1 (lib/models.py:443-461)
    torch.manual_seed(21)
    model.encoder.layers[2] = AdapterLayer(model.encoder.layers[2], 64, 16)
    model.eval()

    cfg = dataclasses.replace(our_cfg(True), ffn_adapter=True, adapter_dim=16)
    params = convert_hf_wav2vec2(model.state_dict(), cfg)
    flags = np.asarray(params["layers"]["adapter"]["flag"])
    np.testing.assert_array_equal(flags, [0.0, 0.0, 1.0])

    b, L = 2, 2000
    audio = rng.randn(b, L).astype(np.float32)
    lengths = np.array([2000, 1400], np.int32)
    in_mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.int64)

    with torch.no_grad():
        hf_out = model(torch.from_numpy(audio),
                       attention_mask=torch.from_numpy(in_mask)
                       ).last_hidden_state.numpy()

    ours, fm = wav2vec2_forward(params, jnp.asarray(audio),
                                jnp.asarray(lengths), cfg)
    diff = np.abs(np.asarray(ours) - hf_out)[np.asarray(fm)]
    assert diff.max() < 2e-4, f"max abs diff {diff.max()}"
