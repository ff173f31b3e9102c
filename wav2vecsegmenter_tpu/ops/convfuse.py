"""Fused stride-folded conv + (bias -> LayerNorm -> GELU) epilogue.

The wav2vec2 feature extractor's 512-channel layers each run as
``n_taps`` plain GEMMs over shifted views of a stride-folded input
(models/wav2vec2._strided_conv1d_as_matmul) followed by the fused
epilogue kernel (ops/layernorm.bias_layer_norm_gelu).  As separate XLA
ops over GB-scale activations that chain costs, per layer: one folded
read per tap GEMM (2x for k=3/s=2), the f32->bf16 GEMM output write,
and the epilogue's read+write.  This kernel does the whole layer in ONE
pass: each grid cell loads a block of folded input rows (plus a 1-row
halo for the second tap, fetched as a second ref of the same array with
a +1-block index map), runs the tap dots on the MXU with f32
accumulation, applies bias + LayerNorm + exact GELU on the VPU, and
writes the bf16 output block — HBM traffic drops from ~3 reads + 2
writes to 1 read + 1 write of the layer's activations.

Two regimes are fused (both default-on, models/wav2vec2.py:446-484):

* **Wide layers** (s*C % 128 == 0, n_taps <= 2 — the 512-ch layers,
  folded depth 1024): tap dots run in-kernel over the folded input, by
  default as ONE wide-N dot over ``[w0 | w1]`` (`_kernel_2tap_wide`);
  ``W2VSEG_CONVWIDE=0`` selects the narrow two-dot variant for A/B.
* **Tiny-ck raw-audio layer** (k*c = 10): the caller pre-concatenates
  the taps into a single [B, T', k*c] operand and the kernel runs the
  1-tap path with ck EQUAL to the array dim (the other legal Mosaic
  block shape) — the win there is purely the saved GEMM-output write +
  epilogue read of the ~1 GB activation.

The ``W2VSEG_CONVWIDE`` flag is captured ONCE at import (module constant
``_CONVWIDE``); like ``W2VSEG_CONVFUSE`` it cannot retoggle an already
jit-traced program — A/B runs need a fresh process per arm.

The tap-1 shifted operand is built WITHOUT sublane-misaligned slicing
(Mosaic relayouts) via ``pltpu.roll`` + a one-row iota select from the
halo ref.  No reshapes cross the sublane/lane boundary in-kernel (that
hangs the Mosaic compiler — see PERF.md negative results).

Backward recomputes through the XLA composition (the feature extractor
is frozen under the reference's fine-tuning recipes; the VJP exists for
completeness, off the hot path).

Reference behavior: HF Wav2Vec2LayerNormConvLayer (conv -> LN -> GELU),
reference lib/models.py:322-368 consumes it via HF Wav2Vec2Model.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .backend import get_backend
from .layernorm import _bln_gelu_xla, _erf_approx

_EPS = 1e-5

# Captured at import: toggling mid-process cannot affect jit-cached programs
# anyway (the read happens at trace time), so make the capture explicit —
# A/B runs (scripts/bench_convfuse_ab.py) use a fresh process per arm.
_CONVWIDE = os.environ.get("W2VSEG_CONVWIDE", "1") == "1"


def convfuse_enabled() -> bool:
    """Route the wide conv layers through the fused whole-layer kernel.

    DEFAULT ON since round 4: the kernel's real-Mosaic lowering is verified
    at full geometry (scripts/probe_convfuse_tpu.py, all stages;
    tests/test_tpu_smoke.py) and the measured A/B is a 1.09x conv-stack win
    (38.4 -> 35.3 ms per 16-window batch, scripts/bench_convfuse_ab.py —
    PERF.md) with tighter numerics (f32 accumulation straight through the
    epilogue, no bf16 GEMM-output write).  W2VSEG_CONVFUSE=0 restores the
    separate GEMM + fused-epilogue path.

    Under an active mesh the kernel shard_maps its batch rows over 'data'
    (conv_bias_ln_gelu via ops/shmap.shard_rows), like the attention/LN
    kernels — GSPMD cannot partition a bare pallas_call.
    """
    return os.environ.get("W2VSEG_CONVFUSE", "1") == "1"


def _xla_ref(y, w_taps, cbias, scale, bias, eps, t_out):
    """Unfused composition: tap GEMMs over shifted folded views, then
    bias+LN+GELU.  Used as the CPU/GPU fallback and the VJP recompute."""
    n_taps = w_taps.shape[0]
    acc = None
    for p in range(n_taps):
        yp = jax.lax.slice_in_dim(y, p, p + t_out, 1, axis=1)
        term = jax.lax.dot_general(
            yp, w_taps[p], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    acc = acc.astype(y.dtype)
    return _bln_gelu_xla(acc, cbias, scale, bias, eps)


def _kernel_2tap(ya_ref, yb_ref, w0_ref, w1_ref, cb_ref, sc_ref, bi_ref,
                 o_ref, *, eps: float, block_rows: int):
    a = ya_ref[0]  # [bt, CK]
    # tap-1 operand: rows shifted up by one, last row = halo (row 0 of the
    # NEXT block, passed as a second ref of the same array).  roll+select
    # keeps every VMEM access sublane-aligned.  The roll runs in f32:
    # Mosaic's tpu.dynamic_rotate lowering rejects bf16 vectors at this
    # shape (tpu_compile_helper exit 1, attributed 2026-08-19) while the
    # identical f32 rotate compiles and matches — two VPU casts per block
    # are noise next to the tap GEMMs.
    a32 = a.astype(jnp.float32)
    rolled = pltpu.roll(a32, block_rows - 1, 0)  # up by one (shift >= 0)
    row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    shifted = jnp.where(
        row == block_rows - 1, yb_ref[0][0:1].astype(jnp.float32),
        rolled).astype(a.dtype)
    acc = jnp.dot(a, w0_ref[:], preferred_element_type=jnp.float32)
    acc += jnp.dot(shifted, w1_ref[:], preferred_element_type=jnp.float32)
    x = acc + cb_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    ynorm = (x - mean) * jax.lax.rsqrt(var + eps)
    ynorm = ynorm * sc_ref[:] + bi_ref[:]
    g = 0.5 * ynorm * (1.0 + _erf_approx(ynorm * (2.0 ** -0.5)))
    o_ref[0] = g.astype(o_ref.dtype)


def _kernel_2tap_wide(ya_ref, yb_ref, w01_ref, w1_ref, cb_ref, sc_ref,
                      bi_ref, o_ref, *, eps: float, block_rows: int):
    """2-tap layer with ONE wide-N dot: ``w01 = [w0 | w1]`` along N.

    Two separate [bt,CK]x[CK,O] dots are MXU issue-limited at N=512
    (PERF.md: in-kernel N=512 ~36 TF/s vs N=1024 ~186 TF/s VMEM-resident);
    concatenating the tap weights along the OUTPUT dim doubles N at zero
    extra FLOPs — unlike the rejected output-grouping, which inflated
    FLOPs by n_taps*G*s/k.  The tap shift then moves to the dot's f32
    output: row r needs tap-1 of row r+1, i.e. ``acc = c0 + roll_up(c1)``
    with the last row's c1 from the halo block's first input row (one
    8-row dot per block; only row 0 consumed).  Both c slices are at lane
    512 — whole (8,128)-tile boundaries, not the ~5x-slow sub-tile lane
    slicing PERF.md warns about — and the roll runs on f32 c1 (Mosaic
    rejects bf16 dynamic_rotate at this shape)."""
    a = ya_ref[0]  # [bt, CK]
    o = o_ref.shape[-1]
    c = jnp.dot(a, w01_ref[:], preferred_element_type=jnp.float32)  # [bt,2O]
    c0 = c[:, :o]
    c1 = c[:, o:]
    rolled = pltpu.roll(c1, block_rows - 1, 0)  # c1[r+1] lands at row r
    halo = jnp.dot(yb_ref[0][0:8], w1_ref[:],
                   preferred_element_type=jnp.float32)[0:1]
    row = jax.lax.broadcasted_iota(jnp.int32, (block_rows, o), 0)
    x = c0 + jnp.where(row == block_rows - 1, halo, rolled)
    x = x + cb_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    ynorm = (x - mean) * jax.lax.rsqrt(var + eps)
    ynorm = ynorm * sc_ref[:] + bi_ref[:]
    g = 0.5 * ynorm * (1.0 + _erf_approx(ynorm * (2.0 ** -0.5)))
    o_ref[0] = g.astype(o_ref.dtype)


def _kernel_1tap(ya_ref, w0_ref, cb_ref, sc_ref, bi_ref, o_ref, *,
                 eps: float):
    a = ya_ref[0]
    acc = jnp.dot(a, w0_ref[:], preferred_element_type=jnp.float32)
    x = acc + cb_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    ynorm = (x - mean) * jax.lax.rsqrt(var + eps)
    ynorm = ynorm * sc_ref[:] + bi_ref[:]
    g = 0.5 * ynorm * (1.0 + _erf_approx(ynorm * (2.0 ** -0.5)))
    o_ref[0] = g.astype(o_ref.dtype)


def _pallas_call(y, w_taps, cbias, scale, bias, eps, t_out, block_rows):
    b, tf, ck = y.shape
    n_taps, _, o = w_taps.shape
    nb_out = -(-t_out // block_rows)  # ragged final block: junk rows are
    # computed from junk reads and dropped on the out-of-bounds write
    nb_in = -(-tf // block_rows)
    vec = pl.BlockSpec((o,), lambda bb, i: (0,), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((ck, o), lambda bb, i: (0, 0),
                          memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, block_rows, ck), lambda bb, i: (bb, i, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, block_rows, o), lambda bb, i: (bb, i, 0),
                            memory_space=pltpu.VMEM)
    if n_taps == 2:
        # halo ref: same array, +1 block (clamped at the edge; the clamped
        # cell's row 0 is only consumed by junk output rows)
        yb_spec = pl.BlockSpec(
            (1, block_rows, ck),
            lambda bb, i: (bb, jnp.minimum(i + 1, nb_in - 1), 0),
            memory_space=pltpu.VMEM)
        if _CONVWIDE:
            # wide-N tap dot (see _kernel_2tap_wide); the narrow two-dot
            # kernel stays behind W2VSEG_CONVWIDE=0 for A/B only
            w01_spec = pl.BlockSpec((ck, 2 * o), lambda bb, i: (0, 0),
                                    memory_space=pltpu.VMEM)
            w01 = jnp.concatenate([w_taps[0], w_taps[1]], axis=1)
            return pl.pallas_call(
                functools.partial(_kernel_2tap_wide, eps=eps,
                                  block_rows=block_rows),
                out_shape=jax.ShapeDtypeStruct((b, t_out, o), y.dtype),
                grid=(b, nb_out),
                in_specs=[y_spec, yb_spec, w01_spec, w_spec, vec, vec, vec],
                out_specs=out_spec,
            )(y, y, w01, w_taps[1], cbias, scale, bias)
        return pl.pallas_call(
            functools.partial(_kernel_2tap, eps=eps, block_rows=block_rows),
            out_shape=jax.ShapeDtypeStruct((b, t_out, o), y.dtype),
            grid=(b, nb_out),
            in_specs=[y_spec, yb_spec, w_spec, w_spec, vec, vec, vec],
            out_specs=out_spec,
        )(y, y, w_taps[0], w_taps[1], cbias, scale, bias)
    assert n_taps == 1, n_taps
    return pl.pallas_call(
        functools.partial(_kernel_1tap, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, t_out, o), y.dtype),
        grid=(b, nb_out),
        in_specs=[y_spec, w_spec, vec, vec, vec],
        out_specs=out_spec,
    )(y, w_taps[0], cbias, scale, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused(y, w_taps, cbias, scale, bias, eps, t_out, block_rows):
    return _pallas_call(y, w_taps, cbias, scale, bias, eps, t_out,
                        block_rows)


def _fused_fwd(y, w_taps, cbias, scale, bias, eps, t_out, block_rows):
    out = _pallas_call(y, w_taps, cbias, scale, bias, eps, t_out,
                       block_rows)
    return out, (y, w_taps, cbias, scale, bias)


def _fused_bwd(eps, t_out, block_rows, res, g):
    y, w_taps, cbias, scale, bias = res
    _, vjp = jax.vjp(
        lambda yy, ww, cb, s, b: _xla_ref(yy, ww, cb, s, b, eps, t_out),
        y, w_taps, cbias, scale, bias)
    return vjp(g.astype(y.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def conv_bias_ln_gelu(y: jax.Array, w_taps: jax.Array, cbias: jax.Array,
                      scale: jax.Array, bias: jax.Array, t_out: int,
                      eps: float = _EPS,
                      block_rows: int = 512) -> jax.Array:
    """One fused pass for a stride-folded conv layer + its LN epilogue.

    ``y`` [B, Tf, CK]: stride-folded input (Tf >= t_out + n_taps - 1; rows
    past the real frames may be garbage — LN/GELU are per-position and the
    caller slices the tail).  ``w_taps`` [n_taps, CK, O]: per-tap weights,
    zero-padded where the kernel extent ends mid-stride.  Returns
    [B, t_out, O] in ``y.dtype``.
    """
    n_taps = w_taps.shape[0]
    assert n_taps in (1, 2), n_taps
    assert y.shape[1] >= t_out + n_taps - 1, (y.shape, t_out, n_taps)
    if get_backend() != "pallas":
        return _xla_ref(y, w_taps, cbias, scale, bias, eps, t_out)
    from .shmap import shard_rows

    # batch rows are independent (the tap halo crosses Tf blocks WITHIN a
    # batch element only), so under an active mesh the kernel shard_maps
    # over 'data' exactly like the LN ops (ops/shmap.py)
    return shard_rows(
        lambda yy, w, cb, s, b: _fused(yy, w, cb, s, b, eps, t_out,
                                       block_rows),
        y, w_taps, cbias, scale, bias)
