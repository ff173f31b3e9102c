"""Fused transformer FFN: (x @ w1 + b1) -> GELU -> (@ w2 + b2), ONE kernel.

The encoder's FFN is the single largest slice of per-layer time (PERF.md:
w1 GEMM+bias+GELU 0.73 ms + w2 GEMM 1.39 ms of a 5.1 ms layer at the
production [16, 999, 1024] batch).  As separate XLA ops the chain
materializes the [B, T, 4096] intermediate in HBM twice: w1's epilogue
writes the activated tensor (~131 MB bf16) and the w2 GEMM reads it back —
and the trace shows that read NOT overlapping the w2 MXU work (1.39 ms vs
the 0.94 ms ideal GEMM).  The GELU cannot ride as a w2 operand fusion
either: profiled at ~81 TF/s vs ~190 clean (PERF.md item 11).

This kernel keeps the intermediate entirely in VMEM: per grid cell it loads
a block of rows, runs the w1 dot (f32 accumulation), applies bias + exact
GELU on the VPU, casts to the input dtype (matching the XLA path's bf16
materialization step, so production numerics only tighten), runs the w2
dot, and writes the output rows.  HBM traffic per layer drops from
read x + write 4F + read 4F + write x  to  read x + write x (plus one
fetch of w1/w2, which Mosaic keeps VMEM-resident across the grid).

Both dots are MXU-shaped: [R, 1024] x [1024, 4096] (N=4096) and
[R, 4096] x [4096, 1024] (N=1024, VMEM-resident operand — the regime PERF.md
measured at ~186 TF/s, NOT the 39 TF/s HBM-streamed case).

The ragged final row block is legal: LN-free, no cross-row accumulation —
junk reads, dropped writes (same contract as ops/layernorm._bln_gelu_call,
verified on real TPU by scripts/probe_uneven_small.py).

Backward recomputes through the XLA composition (convfuse.py precedent):
fine-tuning keeps full gradient support without a hand-written bwd kernel.
Training FORWARDS also use the XLA chain (models/wav2vec2._ffn_block gates
the kernel on deterministic): inside the grad program the pallas_call's
scoped-VMEM stack exceeds the 16 MB limit at batch 14 (the weight mats are
16 MB by themselves), and the kernel's HBM saving is an inference-forward
property — the train step is backward-dominated.

Reference behavior: the feed_forward block of HF Wav2Vec2EncoderLayer
(StableLayerNorm variant), consumed by the reference via lib/models.py:334.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .backend import get_backend
from .layernorm import _erf_approx


def ffnfuse_enabled() -> bool:
    """Route the encoder FFN through the fused whole-block kernel.

    W2VSEG_FFNFUSE=0 restores the separate GEMM chain (A/B arm).  Read at
    trace time — like W2VSEG_CONVFUSE, toggling cannot retarget an already
    jit-cached program; A/B runs use a fresh process per arm."""
    return os.environ.get("W2VSEG_FFNFUSE", "1") == "1"


def ffn_xla(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
            b2: jax.Array) -> jax.Array:
    """Unfused composition (CPU/GPU fallback + VJP recompute).  Mirrors the
    encoder's historical op chain incl. the bf16 materialization between
    GELU and w2 (models/wav2vec2.py layer_body)."""
    t = x @ w1 + b1
    g = jax.nn.gelu(t, approximate=False).astype(x.dtype)
    return g @ w2 + b2


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    a = x_ref[0]  # [R, H]
    t = jnp.dot(a, w1_ref[:], preferred_element_type=jnp.float32)
    t = t + b1_ref[:].astype(jnp.float32)
    g = 0.5 * t * (1.0 + _erf_approx(t * (2.0 ** -0.5)))
    # cast the activated intermediate to the input dtype before the second
    # dot: bf16 operands run the MXU at full rate (f32 dots quarter-rate),
    # and it matches the XLA path's materialized-bf16 numerics
    g = g.astype(a.dtype)
    f = jnp.dot(g, w2_ref[:], preferred_element_type=jnp.float32)
    f = f + b2_ref[:].astype(jnp.float32)
    o_ref[0] = f.astype(o_ref.dtype)


def _ffn_call(x, w1, b1, w2, b2, block_rows):
    b, t, h = x.shape
    f = w1.shape[1]
    nb = -(-t // block_rows)  # ragged final block: junk reads, dropped writes
    return pl.pallas_call(
        _ffn_kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, h), x.dtype),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, block_rows, h), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, f), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda bb, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, h), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda bb, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, h), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t * h * f,
            bytes_accessed=(2 * b * t * h + 2 * h * f) * x.dtype.itemsize,
            transcendentals=b * t * f,
        ),
    )(x, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _ffn_fused(x, w1, b1, w2, b2, block_rows):
    return _ffn_call(x, w1, b1, w2, b2, block_rows)


def _ffn_fwd(x, w1, b1, w2, b2, block_rows):
    return _ffn_call(x, w1, b1, w2, b2, block_rows), (x, w1, b1, w2, b2)


def _ffn_bwd(block_rows, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(ffn_xla, x, w1, b1, w2, b2)
    return vjp(g.astype(x.dtype))


_ffn_fused.defvjp(_ffn_fwd, _ffn_bwd)


def ffn(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
        b2: jax.Array, block_rows: int = 256) -> jax.Array:
    """Fused FFN over [B, T, H] rows; dispatches per backend/mesh.

    Under an active mesh the kernel runs Megatron-style via shard_map: rows
    over 'data', the FFN inner dim over 'model' (w1 cols / b1 / w2 rows —
    the same layout parallel/mesh.param_shardings assigns, so sharded
    weights stay resident), with one psum over 'model' and b2 added once
    after it.
    """
    if get_backend() != "pallas":
        return ffn_xla(x, w1, b1, w2, b2)
    if x.dtype != jnp.bfloat16:
        # f32 ladder arms (runtime.precision f32last<k>/f32): the kernel
        # keeps both weight mats VMEM-resident across the grid, which at
        # f32 is 32 MB and blows the 16 MB scoped-VMEM stack limit
        # (measured Mosaic compile failure at [8,1099,1024] f32,
        # 2026-08-20).  f32 is a fidelity arm, not a perf arm — the XLA
        # chain is the measured-correct path for it (PARITY.md r4 f32 arm).
        return ffn_xla(x, w1, b1, w2, b2)
    from .shmap import shard_ffn

    return shard_ffn(
        lambda xx, a, bb_, c, d: _ffn_fused(xx, a, bb_, c, d, block_rows),
        x, w1, b1, w2, b2)
