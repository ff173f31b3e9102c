"""SHAS segmentation models: wav2vec2 backbone + SFC head.

Constructor signatures mirror the reference Hydra `_target_` surface
(lib/models.py:172-276, conf/task/*.yaml) so existing task configs
instantiate unchanged.  Unlike the reference's nn.Modules, these classes are
*specs*: they hold static architecture config and expose
``init(rng) -> params`` / ``apply(params, ...) -> logits`` plus a
``trainable_mask(params)`` implementing LNA-style partial fine-tuning
(reference lib/models.py:335-365) as 0/1 float pytrees consumed by the
optimizer (gradient/update masking replaces requires_grad).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sfc import init_sfc_params, sfc_forward
from .wav2vec2 import (
    Wav2Vec2Config,
    config_for,
    init_wav2vec2_params,
    wav2vec2_forward,
)


def _mask_like(tree, value: float):
    """Compact trainability mask: scalar leaves (broadcastable against the
    params) — a full-shaped mask tree would double param HBM residency."""
    return jax.tree.map(lambda p: jnp.asarray(value, jnp.float32), tree)


class SHAS:
    """Binary segmentation-frame classifier (reference lib/models.py:172-235)."""

    def __init__(
        self,
        wav2vec_model_name: str = "facebook/wav2vec2-xls-r-300m",
        wav2vec_keep_layers: int = 15,
        finetune_wav2vec: bool = False,
        wav2vec_ft_layers: int = 99,
        finetune_w2v_feat_enc: bool = False,
        finetune_w2v_ffn: bool = False,
        ffn_adapter: bool = False,
        n_transformer_enc_layers: int = 1,
        n_transformer_enc_heads: int = 8,
        init_dropout: float = 0.1,
        vocab_size: int = 1,
    ) -> None:
        self.wav2vec_model_name = wav2vec_model_name
        self.finetune_wav2vec = bool(finetune_wav2vec)
        self.wav2vec_ft_layers = wav2vec_ft_layers
        self.finetune_w2v_feat_enc = bool(finetune_w2v_feat_enc)
        self.finetune_w2v_ffn = bool(finetune_w2v_ffn)
        self.use_adapter = bool(finetune_wav2vec and ffn_adapter)
        self.w2v_cfg: Wav2Vec2Config = config_for(
            wav2vec_model_name, wav2vec_keep_layers, ffn_adapter=self.use_adapter
        )
        self.keep_layers = self.w2v_cfg.num_layers
        self.n_enc_layers = n_transformer_enc_layers
        self.n_enc_heads = n_transformer_enc_heads
        self.init_dropout = init_dropout
        self.vocab_size = vocab_size
        self.d_model = self.w2v_cfg.hidden_size

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array) -> dict:
        k1, k2 = jax.random.split(rng)
        params = {
            "wav2vec": init_wav2vec2_params(k1, self.w2v_cfg),
            "seg": init_sfc_params(
                k2,
                d_model=self.d_model,
                n_layers=self.n_enc_layers,
                vocab_size=self.vocab_size,
            ),
        }
        if self.use_adapter:
            # adapters are active in the top ft_layers of the kept stack
            # (reference HFWav2Vec2WithAdapter, lib/models.py:443-461)
            first_ft = max(0, self.keep_layers - self.wav2vec_ft_layers)
            flags = jnp.array(
                [1.0 if i >= first_ft else 0.0 for i in range(self.keep_layers)],
                jnp.float32,
            )
            params["wav2vec"]["layers"]["adapter"]["flag"] = flags
        return params

    def apply(
        self,
        params: dict,
        audio: jax.Array,        # [B, L] normalized waveforms
        in_lengths: jax.Array,   # [B] valid samples
        out_mask: jax.Array,     # [B, T_out] bool
        *,
        deterministic: bool = True,
        rng: jax.Array | None = None,
        compute_dtype=jnp.float32,
        head_dtype=None,
        residual_dtype=None,
        f32_last_k: int = 0,
    ) -> jax.Array:
        """Returns frame logits [B, T_out] aligned to out_mask.

        The +-1 frame mismatch between the conv stack's true output length
        and the 49.95 Hz estimate (reference lib/models.py:222-232) is
        resolved with static-shape slicing/padding.

        ``head_dtype`` / ``residual_dtype`` / ``f32_last_k`` are the
        mixed-precision ladder knobs (runtime.precision, PARITY.md): SFC
        head dtype, encoder residual-stream/LN dtype, and the number of
        final encoder layers run fully in f32.
        """
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        h, frame_mask = wav2vec2_forward(
            params["wav2vec"], audio, in_lengths, self.w2v_cfg,
            deterministic=deterministic, rng=rngs[0],
            compute_dtype=compute_dtype,
            freeze_feature_encoder=(
                self.finetune_wav2vec and not self.finetune_w2v_feat_enc),
            n_frozen_layers=(
                max(0, self.keep_layers - self.wav2vec_ft_layers)
                if self.finetune_wav2vec else 0),
            freeze_ffn=(
                self.finetune_wav2vec and not self.finetune_w2v_ffn),
            residual_dtype=residual_dtype, f32_last_k=f32_last_k,
        )
        if not self.finetune_wav2vec:
            # frozen backbone: requires_grad=False equivalent — skips the
            # whole wav2vec backward (reference lib/models.py:335-337)
            h = jax.lax.stop_gradient(h)
        t_out = out_mask.shape[1]
        t_conv = h.shape[1]
        if t_conv > t_out:
            h = h[:, :t_out]
            frame_mask = frame_mask[:, :t_out]
        elif t_conv < t_out:
            pad = t_out - t_conv
            h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
            frame_mask = jnp.pad(frame_mask, ((0, 0), (0, pad)))
        logits = sfc_forward(
            params["seg"], h, out_mask, self.n_enc_heads,
            dropout=self.init_dropout, deterministic=deterministic,
            rng=rngs[1], compute_dtype=head_dtype or compute_dtype,
        )
        return logits

    # ------------------------------------------------------------------
    def trainable_mask(self, params: dict) -> dict:
        """0/1 float pytree of trainable leaves (LNA freezing,
        reference lib/models.py:335-365)."""
        mask = {"seg": _mask_like(params["seg"], 1.0)}
        w2v = params["wav2vec"]
        if not self.finetune_wav2vec:
            mask["wav2vec"] = _mask_like(w2v, 0.0)
            return mask

        m: dict = {}
        feat_flag = 1.0 if self.finetune_w2v_feat_enc else 0.0
        m["feature_extractor"] = _mask_like(w2v["feature_extractor"], feat_flag)
        m["feature_projection"] = _mask_like(w2v["feature_projection"], feat_flag)
        # pos_conv is not frozen by the reference's finetune branch
        m["pos_conv"] = _mask_like(w2v["pos_conv"], 1.0)
        if "encoder_pre_ln" in w2v:
            m["encoder_pre_ln"] = _mask_like(w2v["encoder_pre_ln"], 1.0)
        if "masked_spec_embed" in w2v:
            m["masked_spec_embed"] = _mask_like(w2v["masked_spec_embed"], 1.0)

        first_ft = max(0, self.keep_layers - self.wav2vec_ft_layers)
        layer_flags = jnp.array(
            [0.0 if i < first_ft else 1.0 for i in range(self.keep_layers)],
            jnp.float32,
        )

        def per_layer(path_has_ffn):
            def fn(p):
                flags = layer_flags
                if path_has_ffn and not self.finetune_w2v_ffn:
                    flags = jnp.zeros_like(layer_flags)
                # broadcastable [L, 1, ...] — never materialize param-shaped
                shape = (p.shape[0],) + (1,) * (p.ndim - 1)
                return flags.reshape(shape).astype(jnp.float32)
            return fn

        layers_mask = {}
        for key, sub in w2v["layers"].items():
            is_ffn = key == "ffn"
            if key == "adapter":
                # adapters always train where active (flag field itself is
                # static config, never updated)
                layers_mask[key] = {
                    "down": jax.tree.map(per_layer(False), sub["down"]),
                    "up": jax.tree.map(per_layer(False), sub["up"]),
                    "flag": jnp.zeros_like(sub["flag"]),
                }
            else:
                layers_mask[key] = jax.tree.map(per_layer(is_ffn), sub)
        m["layers"] = layers_mask
        mask["wav2vec"] = m
        return mask

    # checkpoint layout flag (reference train.py:596-613: seg-only when the
    # backbone is frozen)
    @property
    def save_full_state(self) -> bool:
        return self.finetune_wav2vec


class SHASWithSSL:
    """CTC backbone + multi-class SFC head (reference lib/models.py:238-276).

    The backbone is the *full* (untruncated) wav2vec2 with a CTC lm_head;
    forward returns (ctc_logits, frame_logits).
    """

    def __init__(
        self,
        wav2vec_model_name: str = "facebook/wav2vec2-large-960h-lv60-self",
        finetune_wav2vec: bool = False,
        wav2vec_ft_layers: int | None = None,
        finetune_w2v_feat_enc: bool = True,
        n_transformer_enc_layers: int = 1,
        n_transformer_enc_heads: int = 8,
        init_dropout: float = 0.1,
        vocab_size: int = 36,
        ctc_vocab_size: int = 32,
        wav2vec_keep_layers: int | None = None,
    ) -> None:
        self.wav2vec_model_name = wav2vec_model_name
        self.finetune_wav2vec = bool(finetune_wav2vec)
        # keep_layers: the reference's shas_ctc task truncates its (never-
        # implemented) CTC backbone to 15 layers (conf/task/shas_ctc.yaml:6);
        # None keeps the full stack (the ssl task's contract)
        self.w2v_cfg = config_for(wav2vec_model_name,
                                  keep_layers=wav2vec_keep_layers)
        self.n_enc_layers = n_transformer_enc_layers
        self.n_enc_heads = n_transformer_enc_heads
        self.init_dropout = init_dropout
        self.vocab_size = vocab_size
        self.ctc_vocab_size = ctc_vocab_size
        self.d_model = self.w2v_cfg.hidden_size
        # full model keeps its final encoder LayerNorm (no truncation)
        self.keep_final_ln = True

    def init(self, rng: jax.Array) -> dict:
        k1, k2, k3 = jax.random.split(rng, 3)
        import math

        scale = 1.0 / math.sqrt(self.d_model)
        return {
            "wav2vec": init_wav2vec2_params(k1, self.w2v_cfg),
            "final_ln": {
                "scale": jnp.ones((self.d_model,), jnp.float32),
                "bias": jnp.zeros((self.d_model,), jnp.float32),
            },
            "lm_head": {
                "w": jax.random.uniform(
                    k3, (self.d_model, self.ctc_vocab_size), jnp.float32,
                    -scale, scale),
                "b": jnp.zeros((self.ctc_vocab_size,), jnp.float32),
            },
            "seg": init_sfc_params(
                k2, d_model=self.d_model, n_layers=self.n_enc_layers,
                vocab_size=self.vocab_size,
            ),
        }

    def apply(self, params, audio, in_lengths, out_mask, *,
              deterministic=True, rng=None, compute_dtype=jnp.float32):
        from ..ops.layernorm import layer_norm

        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        h, frame_mask = wav2vec2_forward(
            params["wav2vec"], audio, in_lengths, self.w2v_cfg,
            deterministic=deterministic, rng=rngs[0],
            compute_dtype=compute_dtype,
        )
        if not self.finetune_wav2vec:
            h = jax.lax.stop_gradient(h)
        # HF Wav2Vec2ForCTC: final encoder LN then lm_head on last hidden
        h_ln = layer_norm(h, params["final_ln"]["scale"],
                          params["final_ln"]["bias"])
        ctc_logits = h_ln @ params["lm_head"]["w"] + params["lm_head"]["b"]

        t_out = out_mask.shape[1]
        h_aligned = h_ln
        if h_aligned.shape[1] > t_out:
            h_aligned = h_aligned[:, :t_out]
        elif h_aligned.shape[1] < t_out:
            h_aligned = jnp.pad(
                h_aligned, ((0, 0), (0, t_out - h_aligned.shape[1]), (0, 0)))
        frame_logits = sfc_forward(
            params["seg"], h_aligned, out_mask, self.n_enc_heads,
            dropout=self.init_dropout, deterministic=deterministic,
            rng=rngs[1], compute_dtype=compute_dtype,
        )
        return ctc_logits, frame_logits

    def trainable_mask(self, params: dict) -> dict:
        mask = {
            "seg": _mask_like(params["seg"], 1.0),
            "final_ln": _mask_like(params["final_ln"],
                                   1.0 if self.finetune_wav2vec else 0.0),
            "lm_head": _mask_like(params["lm_head"],
                                  1.0 if self.finetune_wav2vec else 0.0),
            "wav2vec": _mask_like(params["wav2vec"],
                                  1.0 if self.finetune_wav2vec else 0.0),
        }
        return mask

    @property
    def save_full_state(self) -> bool:
        return self.finetune_wav2vec


class AutoRegSegmenter:
    """Autoregressive encoder-decoder segmenter (reference lib/models.py:11-58).

    Constructed lazily to keep the decoder code out of the hot import path;
    see models/autoreg.py.
    """

    def __new__(cls, *args, **kwargs):
        from .autoreg import AutoRegSegmenterImpl

        return AutoRegSegmenterImpl(*args, **kwargs)
