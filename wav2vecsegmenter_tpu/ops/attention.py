"""Multi-head self-attention over padded windows, differentiable.

Windows are <=1024 frames (20 s x 49.95 Hz = 999), so the whole score matrix
of one (batch, head) fits comfortably in VMEM: the Pallas forward kernel
computes QK^T, the masked softmax and the PV product in a single fused pass
per (batch, head) grid cell — one HBM read of Q/K/V, one write of O, no
[B,H,T,T] intermediate ever touching HBM.

Layout: the kernels run on [B, H, T, D] with (1, 1, T, D) blocks, T and D
left UNPADDED (blocks spanning full dims are legal at any size; a packed
[B, T, H, D] layout can't feed the kernel because Mosaic rejects middle-dim
blocks of extent 1 < 8 sublanes).  ``attention_bthd`` takes the packed
[B, T, H, D] shape the fused QKV GEMM produces and does the head transpose
internally.  Versus the original kernels this drops the D=64->128
zero-padding (which doubled kernel HBM traffic for nothing: the MXU pads
the 64-deep contraction internally either way) and the T padding to a lane
multiple.  The softmax division is deferred past the PV matmul — dividing
[T, D] instead of [T, T] cuts a full score-sized VPU pass + write per cell.

The backward pass is a second fused kernel (flash-attention style, blocked
over query rows): probabilities are recomputed from Q/K (cheaper than
storing the [T,T] matrix), then dV = P^T dO, dS = P*(dP - rowsum(dP*P)),
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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .backend import get_backend

NEG_INF = -1e30


def attention_xla_bthd(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None,  # [B, T] bool, True = valid
    scale: float,
) -> jax.Array:
    q32 = q.astype(jnp.float32)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q32 * scale, k.astype(jnp.float32))
    if key_mask is not None:
        bias = jnp.where(key_mask[:, None, None, :], 0.0, NEG_INF)
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


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
# pallas kernels: blocks slice one (batch, head) out of [B, H, T, D];
# bias is a float additive key bias [B, 1, T_k]
# ---------------------------------------------------------------------------

def _attn_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    # block views: q/k/v [1, 1, T, D] for one (batch, head); bias [1, 1, T].
    # Dots run in the INPUT dtype (bf16 in production — full MXU rate; f32
    # matmuls run at quarter rate) with f32 accumulation; the scale is
    # applied to the f32 scores so low dtypes lose nothing to pre-scaling.
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [T, T]
    scores = scores + bias_ref[0, 0, :][None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    # deferred normalization: PV first, divide the [T, D] result (a [T, T]
    # division + write is a full extra VPU pass over the score matrix)
    s = jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.dot(e.astype(v_ref.dtype), v_ref[0, 0],
                  preferred_element_type=jnp.float32)
    o_ref[0, 0] = (out / s).astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float, block_q: int):
    # grid: (B, H, T // block_q); dk/dv blocks are revisited across the
    # innermost grid dim and accumulated (index_map constant in jq)
    jq = pl.program_id(2)

    # dots in the input dtype (bf16 at full MXU rate in production, f32 in
    # tests), f32 accumulation; softmax statistics stay f32
    dt = q_ref.dtype
    q = q_ref[0, 0]                            # [Bq, D]
    k = k_ref[0, 0]                            # [T, D]
    v = v_ref[0, 0]                            # [T, D]
    do = do_ref[0, 0]                          # [Bq, D]
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

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    @pl.when(jq == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref[...])
        dv_ref[...] = jnp.zeros_like(dv_ref[...])

    dk_ref[0, 0] += dk.astype(dk_ref.dtype)
    dv_ref[0, 0] += dv.astype(dv_ref.dtype)


def _key_bias(key_mask, b, t):
    if key_mask is None:
        return jnp.zeros((b, 1, t), jnp.float32)
    return jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]


def _fwd_call(q, k, v, bias, scale):
    # tq may differ from tk (decoder cross-attention); bias covers the keys
    b, h, tq, d = q.shape
    tk = k.shape[2]
    qspec = pl.BlockSpec((1, 1, tq, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, tk, d), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, tq, d), q.dtype),
        grid=(b, h),
        in_specs=[
            qspec, kvspec, kvspec,
            pl.BlockSpec((1, 1, tk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qspec,
        cost_estimate=pl.CostEstimate(
            flops=4 * tq * tk * d * b * h,
            bytes_accessed=2 * b * h * (tq + tk) * d * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
    )(q, k, v, bias)


def _bwd_call(q, k, v, bias, do, scale):
    # tq may differ from tk (decoder cross-attention)
    b, h, tq_orig, d = q.shape
    tk = k.shape[2]
    block_q = min(256, tq_orig)
    tq = pl.cdiv(tq_orig, block_q) * block_q
    if tq != tq_orig:
        # zero-pad QUERY time to a whole number of blocks; padded query rows
        # have do == 0 (=> ds == 0), so the dk/dv accumulation stays exact
        # and their dq rows are sliced off below.  Keys keep tk unpadded.
        pad = ((0, 0), (0, 0), (0, tq - tq_orig), (0, 0))
        q, do = (jnp.pad(a, pad) for a in (q, do))
    n_q = tq // block_q
    f32 = jnp.float32
    qspec = pl.BlockSpec((1, 1, block_q, d), lambda i, j, jq: (i, j, jq, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, tk, d), lambda i, j, jq: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, block_q=block_q),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, tq, d), f32),
            jax.ShapeDtypeStruct((b, h, tk, d), f32),
            jax.ShapeDtypeStruct((b, h, tk, d), f32),
        ),
        grid=(b, h, n_q),
        in_specs=[
            qspec, kvspec, kvspec,
            pl.BlockSpec((1, 1, tk), lambda i, j, jq: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            qspec,
        ],
        out_specs=(qspec, kvspec, kvspec),
    )(q, k, v, bias, do)
    if tq != tq_orig:
        dq = dq[:, :, :tq_orig]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# differentiable wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_attention(q, k, v, bias, scale):
    return _fwd_call(q, k, v, bias, scale)


def _fused_fwd(q, k, v, bias, scale):
    out = _fwd_call(q, k, v, bias, scale)
    return out, (q, k, v, bias)


def _fused_bwd(scale, res, g):
    q, k, v, bias = res
    dq, dk, dv = _bwd_call(q, k, v, bias, g, scale)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(bias))


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


def _dispatch_fused(q, k, v, bias, scale):
    """Fused attention, shard_map'd over an active mesh (batch -> 'data',
    heads -> 'model'; ops/shmap.py) — plain pallas_call otherwise."""
    from .shmap import shard_attention

    return shard_attention(
        lambda a, b_, c, d: _fused_attention(a, b_, c, d, scale),
        q, k, v, bias)


def attention_pallas_bthd(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None,
    scale: float,
) -> jax.Array:
    # one [B,T,H,D] -> [B,H,T,D] transpose per operand (Mosaic blocks can't
    # slice a middle dim whose block extent is 1 < 8, so the packed layout
    # cannot feed the kernel directly); T and D stay UNPADDED — blocks span
    # the full dims, which Mosaic accepts at any size
    b, t, h, d = q.shape
    bias = _key_bias(key_mask, b, k.shape[1])  # bias covers the KEYS
    out = _dispatch_fused(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                          v.transpose(0, 2, 1, 3), bias, float(scale))
    return out.transpose(0, 2, 1, 3)


def attention_bthd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Self-attention in packed layout: q/k/v [B, T, H, D], key_mask [B, T].

    The preferred entry point: feed the QKV projection output directly
    (reshape [B, T, 3, H, D] and slice — no transpose), get back [B, T, H, D]
    ready for a reshape into the output projection.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if get_backend() == "pallas":
        return attention_pallas_bthd(q, k, v, key_mask, scale)
    return attention_xla_bthd(q, k, v, key_mask, scale)


# ---------------------------------------------------------------------------
# packed-layout kernel: consumes the fused QKV GEMM's output [B, T, 3H]
# directly — NO head relayout.  The legacy path's [B,T,3,H,D] -> [B,H,T,D]
# transpose costs 0.79-0.93 ms/layer at production geometry (PERF.md trace:
# "qkv head relayout"), pure HBM copies.  Here each grid cell reads a
# 128-LANE-ALIGNED column block of the GEMM output: for D=128 that is one
# head; for D=64 a PAIR of adjacent heads, separated in-kernel by
# zero-masked contractions instead of the ~5x-slow sub-tile lane slicing
# (CLAUDE.md):  q_pair @ (k_pair*mask_h)^T contracts 128 lanes of which the
# other head's are zero — exact, and FREE on the MXU because it pads the
# 64-deep contraction to 128 internally anyway (see module docstring).  The
# PV products recombine for free too: P_h @ (v_pair*mask_h) leaves zeros in
# the other head's lanes, so out = sum over the pair lands already packed
# [T, 128] and the output block writes straight into [B, T, H] — ready for
# the o-projection with no transpose.
# ---------------------------------------------------------------------------

_PACK_W = 128  # lane width of one packed head block (the TPU tile width)


def _attn_fwd_packed_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                            scale: float, d: int):
    q = q_ref[0]  # [T, 128]: one head (d=128) or two adjacent heads (d=64)
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0, 0, :][None, :]  # [1, T] additive key bias

    def one_head(kh, vh):
        s = jax.lax.dot_general(
            q, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias                       # [T, T]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        z = jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(e.astype(vh.dtype), vh,
                    preferred_element_type=jnp.float32)
        return o / z                           # [T, 128]

    if d == _PACK_W:
        out = one_head(k, v)
    else:
        # head pair: zero the OTHER head's lanes of k/v per contraction.
        # q needs no mask — its other-head lanes multiply k's zeros.
        lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
        lo = lane < d
        zero = jnp.zeros_like(k)
        out = (one_head(jnp.where(lo, k, zero), jnp.where(lo, v, zero))
               + one_head(jnp.where(lo, zero, k), jnp.where(lo, zero, v)))
    o_ref[0] = out.astype(o_ref.dtype)


def _fwd_packed_call(proj, bias, scale, num_heads):
    b, t, th = proj.shape
    h = th // 3
    d = h // num_heads
    nhb = h // _PACK_W  # packed head blocks per q/k/v section
    sect = pl.BlockSpec  # alias for line width

    def blk(off):
        return sect((1, t, _PACK_W), lambda i, j, off=off: (i, 0, off + j),
                    memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_attn_fwd_packed_kernel, scale=scale, d=d),
        out_shape=jax.ShapeDtypeStruct((b, t, h), proj.dtype),
        grid=(b, nhb),
        in_specs=[
            blk(0), blk(nhb), blk(2 * nhb),
            sect((1, 1, t), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=sect((1, t, _PACK_W), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * t * t * h * b,
            bytes_accessed=(3 * b * t * h + b * t * h) * proj.dtype.itemsize,
            transcendentals=b * (h // d) * t * t,
        ),
    )(proj, proj, proj, bias)


def _unpack_qkv(proj, num_heads):
    b, t, th = proj.shape
    h = th // 3
    d = h // num_heads
    qkv = proj.reshape(b, t, 3, num_heads, d).transpose(2, 0, 3, 1, 4)
    return qkv[0], qkv[1], qkv[2]  # each [B, H, T, D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_attn_packed(proj, bias, scale, num_heads):
    return _fwd_packed_call(proj, bias, scale, num_heads)


def _packed_fwd(proj, bias, scale, num_heads):
    return _fwd_packed_call(proj, bias, scale, num_heads), (proj, bias)


def _packed_bwd(scale, num_heads, res, g):
    # backward via the legacy [B,H,T,D] kernel: the relayout transposes move
    # to the backward pass only (training); inference never pays them
    proj, bias = res
    b, t, th = proj.shape
    h = th // 3
    d = h // num_heads
    q, k, v = _unpack_qkv(proj, num_heads)
    do = g.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3).astype(q.dtype)
    dq, dk, dv = _bwd_call(q, k, v, bias, do, scale)
    dqkv = jnp.stack([dq, dk, dv])  # [3, B, H, T, D] f32
    dproj = dqkv.transpose(1, 3, 0, 2, 4).reshape(b, t, th)
    return dproj.astype(proj.dtype), jnp.zeros_like(bias)


_fused_attn_packed.defvjp(_packed_fwd, _packed_bwd)


def attention_packed(
    proj: jax.Array,  # [B, T, 3H]: fused QKV GEMM output, heads contiguous
    key_mask: jax.Array | None,
    num_heads: int,
    scale: float | None = None,
) -> jax.Array:
    """Self-attention straight off the packed QKV projection -> [B, T, H].

    Preferred TPU entry point: no head relayout in the forward.  Falls back
    to the legacy [B,H,T,D] path when the geometry doesn't give 128-lane
    head blocks (D not 64/128 or H not a 128-multiple), or when an active
    mesh has a model axis (heads shard over 'model' only in the head-major
    layout — the packed lane order interleaves q/k/v sections, which a
    last-dim sharding would split incorrectly).
    """
    b, t, th = proj.shape
    h = th // 3
    d = h // num_heads
    if scale is None:
        scale = d ** -0.5
    # W2VSEG_ATTNPACK=0 restores the legacy relayout path (A/B arm); read
    # at trace time — fresh process per arm, like W2VSEG_CONVFUSE
    packed_on = os.environ.get("W2VSEG_ATTNPACK", "1") == "1"
    if (packed_on and get_backend() == "pallas" and h % _PACK_W == 0
            and d in (64, 128)):
        from .backend import get_mesh
        from .shmap import shard_batch

        mesh = get_mesh()
        if mesh is None or mesh.shape.get("model", 1) <= 1:
            bias = _key_bias(key_mask, b, t)
            return shard_batch(
                lambda p, bb: _fused_attn_packed(p, bb, float(scale),
                                                 num_heads),
                proj, bias)
    q, k, v = _unpack_qkv(proj, num_heads)
    out = attention(q, k, v, key_mask, scale)
    return out.transpose(0, 2, 1, 3).reshape(b, t, h)


def attention_pallas(
    q: jax.Array,  # [B, H, T, D]
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None,
    scale: float,
) -> jax.Array:
    b, h, t, d = q.shape
    bias = _key_bias(key_mask, b, k.shape[2])  # bias covers the KEYS
    return _dispatch_fused(q, k, v, bias, float(scale))


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Self-attention dispatch: q/k/v [B, H, T, D], key_mask [B, T] bool.

    Legacy layout — prefer :func:`attention_bthd`, which skips the head
    transpose entirely.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if get_backend() == "pallas":
        return attention_pallas(q, k, v, key_mask, scale)
    return attention_xla(q, k, v, key_mask, scale)
