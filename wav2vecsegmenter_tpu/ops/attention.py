"""Multi-head self-attention over padded windows.

Windows are <=1024 frames (20 s x 49.95 Hz = 999, padded to the next lane
multiple), so the whole score matrix of one (batch, head) fits comfortably in
VMEM (1024x1024 f32 = 4 MB): the Pallas kernel computes QK^T, the masked
softmax and the PV product in a single fused pass per (batch, head) grid cell
— one HBM read of Q/K/V, one write of O, no [B,H,T,T] intermediate ever
touching HBM.  This is the fastest regime for short sequences; a tiled
flash-attention loop would only add overhead at T<=1024.

Key padding semantics match torch's ``src_key_padding_mask`` /
HF ``attention_mask``: padded *keys* get -inf scores before softmax; padded
query rows produce garbage that callers zero out via the output mask
(reference lib/evaluate.py:90-91 relies on this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .backend import get_backend

NEG_INF = -1e30


def attention_xla(
    q: jax.Array,  # [B, H, T, D]
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None,  # [B, T] bool, True = valid
    scale: float,
) -> jax.Array:
    q32 = q.astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q32 * scale, k.astype(jnp.float32))
    if key_mask is not None:
        bias = jnp.where(key_mask[:, None, None, :], 0.0, NEG_INF)
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    # block views: q/k/v [1, T, D] for one (batch, head); mask [1, 1, T]
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [T, T]
    mask = mask_ref[0, 0, :]  # [T]
    scores = jnp.where(mask[None, :] > 0, scores, NEG_INF)
    # numerically-stable masked softmax
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / denom
    out = jnp.dot(probs.astype(v_ref.dtype), v_ref[0],
                  preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def attention_pallas(
    q: jax.Array,  # [B, H, T, D]
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None,
    scale: float,
) -> jax.Array:
    b, h, t, d = q.shape
    # pad T to sublane multiple and D to lane multiple
    t_pad = ((t + 127) // 128) * 128
    d_pad = ((d + 127) // 128) * 128
    if key_mask is None:
        key_mask = jnp.ones((b, t), dtype=jnp.int32)
    key_mask = key_mask.astype(jnp.int32)
    if t_pad != t or d_pad != d:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, t_pad - t)))

    qf = q.reshape(b * h, t_pad, d_pad)
    kf = k.reshape(b * h, t_pad, d_pad)
    vf = v.reshape(b * h, t_pad, d_pad)
    maskf = jnp.repeat(key_mask, h, axis=0)[:, None, :]  # [B*H, 1, T]

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d_pad), q.dtype),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, t_pad, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_pad, d_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * t_pad * t_pad * d_pad * b * h,
            bytes_accessed=4 * b * h * t_pad * d_pad * 4,
            transcendentals=b * h * t_pad * t_pad,
        ),
    )(qf, kf, vf, maskf)

    out = out.reshape(b, h, t_pad, d_pad)
    return out[:, :, :t, :d]


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Self-attention dispatch: q/k/v [B, H, T, D], key_mask [B, T] bool."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if get_backend() == "pallas":
        return attention_pallas(q, k, v, key_mask, scale)
    return attention_xla(q, k, v, key_mask, scale)
