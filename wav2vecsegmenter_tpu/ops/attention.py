"""Multi-head self-attention over padded windows, differentiable.

Windows are <=1024 frames (20 s x 49.95 Hz = 999, padded to the next lane
multiple), so the whole score matrix of one (batch, head) fits comfortably in
VMEM: the Pallas forward kernel computes QK^T, the masked softmax and the PV
product in a single fused pass per (batch, head) grid cell — one HBM read of
Q/K/V, one write of O, no [B,H,T,T] intermediate ever touching HBM.

The backward pass is a second fused kernel (flash-attention style, blocked
over query rows): probabilities are recomputed from Q/K (cheaper than storing
the [T,T] matrix), then dV = P^T dO, dS = P*(dP - rowsum(dP*P)),
dQ = dS K * scale, dK = dS^T Q * scale, with dK/dV accumulated across query
blocks in revisited output blocks.  Wired up with jax.custom_vjp so the same
fused kernels serve LNA fine-tuning (reference lib/models.py:351-365) —
without this the TPU training path would fall back to materializing
[B, H, T, T] score tensors in HBM per layer.

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


# ---------------------------------------------------------------------------
# pallas kernels (operate on [BH, T, D] with a float additive key bias)
# ---------------------------------------------------------------------------

def _attn_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    # block views: q/k/v [1, T, D] for one (batch, head); bias [1, 1, T].
    # Dots run in the INPUT dtype (bf16 in production — full MXU rate; f32
    # matmuls run at quarter rate) with f32 accumulation; the scale is
    # applied to the f32 scores so low dtypes lose nothing to pre-scaling.
    scores = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [T, T]
    scores = scores + bias_ref[0, 0, :][None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.dot(probs.astype(v_ref.dtype), v_ref[0],
                  preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float, block_q: int):
    # grid: (BH, T // block_q); dk/dv blocks are revisited across the inner
    # grid dim and accumulated (index_map constant in jq)
    jq = pl.program_id(1)

    # dots in the input dtype (bf16 at full MXU rate in production, f32 in
    # tests), f32 accumulation; softmax statistics stay f32
    dt = q_ref.dtype
    q = q_ref[0]                               # [Bq, D]
    k = k_ref[0]                               # [T, D]
    v = v_ref[0]                               # [T, D]
    do = do_ref[0]                             # [Bq, D]
    bias = bias_ref[0, 0, :][None, :]          # [1, T]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias                           # [Bq, T]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    pc = p.astype(dt)

    # dV += P^T dO
    dv = jax.lax.dot_general(
        pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                          # [T, D]
    # dP = dO V^T ; dS = P * (dP - rowsum(dP * P))
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                          # [Bq, T]
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row)                        # [Bq, T]
    dsc = ds.astype(dt)
    # dQ = dS K * scale
    dq = jnp.dot(dsc, k, preferred_element_type=jnp.float32) * scale
    # dK += dS^T Q * scale
    dk = jax.lax.dot_general(
        dsc, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                  # [T, D]

    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(jq == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk.astype(dk_ref.dtype)
    dv_ref[0] += dv.astype(dv_ref.dtype)


def _pad_qkv(q, k, v, key_mask):
    b, h, t, d = q.shape
    t_pad = ((t + 127) // 128) * 128
    d_pad = ((d + 127) // 128) * 128
    if key_mask is None:
        key_mask = jnp.ones((b, t), bool)
    if t_pad != t or d_pad != d:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, t_pad - t)))
    bias = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)
    qf = q.reshape(b * h, t_pad, d_pad)
    kf = k.reshape(b * h, t_pad, d_pad)
    vf = v.reshape(b * h, t_pad, d_pad)
    biasf = jnp.repeat(bias, h, axis=0)[:, None, :]  # [BH, 1, T]
    return qf, kf, vf, biasf, t_pad, d_pad


def _fwd_call(qf, kf, vf, biasf, scale):
    bh, t_pad, d_pad = qf.shape
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d_pad), qf.dtype),
        grid=(bh,),
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
            flops=4 * t_pad * t_pad * d_pad * bh,
            bytes_accessed=4 * bh * t_pad * d_pad * 4,
            transcendentals=bh * t_pad * t_pad,
        ),
    )(qf, kf, vf, biasf)


def _bwd_call(qf, kf, vf, biasf, dof, scale):
    bh, t_pad, d_pad = qf.shape
    block_q = min(256, t_pad)
    n_q = t_pad // block_q
    grid = (bh, n_q)
    f32 = jnp.float32
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, block_q=block_q),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t_pad, d_pad), f32),
            jax.ShapeDtypeStruct((bh, t_pad, d_pad), f32),
            jax.ShapeDtypeStruct((bh, t_pad, d_pad), f32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(qf, kf, vf, biasf, dof)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# differentiable wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_attention(qf, kf, vf, biasf, scale):
    return _fwd_call(qf, kf, vf, biasf, scale)


def _fused_fwd(qf, kf, vf, biasf, scale):
    out = _fwd_call(qf, kf, vf, biasf, scale)
    return out, (qf, kf, vf, biasf)


def _fused_bwd(scale, res, g):
    qf, kf, vf, biasf = res
    dq, dk, dv = _bwd_call(qf, kf, vf, biasf, g, scale)
    return (dq.astype(qf.dtype), dk.astype(kf.dtype), dv.astype(vf.dtype),
            jnp.zeros_like(biasf))


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


def attention_pallas(
    q: jax.Array,  # [B, H, T, D]
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None,
    scale: float,
) -> jax.Array:
    b, h, t, d = q.shape
    qf, kf, vf, biasf, t_pad, d_pad = _pad_qkv(q, k, v, key_mask)
    out = _fused_attention(qf, kf, vf, biasf, float(scale))
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
