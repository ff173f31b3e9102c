"""Shared test fixtures: tiny model specs and synthetic audio."""

import numpy as np

from wav2vecsegmenter_tpu.data.audio import write_wav
from wav2vecsegmenter_tpu.models.shas import SHAS
from wav2vecsegmenter_tpu.models.wav2vec2 import Wav2Vec2Config

# Real 7-layer conv geometry (320x downsample -> 49.95 Hz frame math holds),
# tiny channel/width dims for fast CPU tests.
TINY_W2V = Wav2Vec2Config(
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    ffn_dim=128,
    conv_dim=(32, 32, 32, 32, 32, 32, 32),
    conv_kernel=(10, 3, 3, 3, 3, 2, 2),
    conv_stride=(5, 2, 2, 2, 2, 2, 2),
    conv_bias=True,
    feat_extract_norm="layer",
    do_stable_layer_norm=True,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    hidden_dropout=0.0,
    attention_dropout=0.0,
    activation_dropout=0.0,
    feat_proj_dropout=0.0,
)


def tiny_shas(**kwargs) -> SHAS:
    model = SHAS(
        wav2vec_keep_layers=2,
        n_transformer_enc_layers=1,
        n_transformer_enc_heads=4,
        init_dropout=0.0,
        **kwargs,
    )
    model.w2v_cfg = TINY_W2V
    model.d_model = TINY_W2V.hidden_size
    model.keep_layers = TINY_W2V.num_layers
    return model


def make_speechlike_wav(path, duration_secs=65.0, sample_rate=16000, seed=0):
    """Synthetic speech-like audio: amplitude-modulated noise with silent
    pauses every few seconds."""
    rng = np.random.RandomState(seed)
    n = int(duration_secs * sample_rate)
    t = np.arange(n) / sample_rate
    x = rng.randn(n).astype(np.float32) * 0.1
    # speech bursts ~3 s, pauses ~0.5 s
    envelope = ((t % 3.5) < 3.0).astype(np.float32)
    x *= envelope
    write_wav(path, x, sample_rate)
    return path
