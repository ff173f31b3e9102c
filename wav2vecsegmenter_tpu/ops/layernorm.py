"""LayerNorm: Pallas fused kernel (TPU) with an XLA fallback.

LayerNorm is memory-bound; the fused kernel reads each row of activations
from HBM once, computes mean/var on the VPU, and writes the normalized row —
no intermediate HBM round-trips.  Matches torch.nn.LayerNorm semantics
(biased variance, eps inside the sqrt), which both the wav2vec2 encoder and
the SFC head rely on (reference lib/models.py:303, HF modeling_wav2vec2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .backend import get_backend

_EPS = 1e-5


def layer_norm_xla(x: jax.Array, scale: jax.Array, bias: jax.Array,
                   eps: float = _EPS) -> jax.Array:
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(orig_dtype)


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * scale_ref[:] + bias_ref[:]).astype(o_ref.dtype)


def _ln_bwd_kernel(x_ref, scale_ref, g_ref, dx_ref, dscale_ref, dbias_ref,
                   *, eps: float):
    """Fused LN backward per row block; dscale/dbias accumulate across the
    grid (revisited output blocks, constant index map)."""
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    h = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd

    gs = g * scale_ref[:][None, :]
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    dx = (gs - m1 - xhat * m2) * rstd
    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dscale_ref[:] = jnp.zeros_like(dscale_ref[:])
        dbias_ref[:] = jnp.zeros_like(dbias_ref[:])

    dscale_ref[:] += jnp.sum(g * xhat, axis=0).astype(dscale_ref.dtype)
    dbias_ref[:] += jnp.sum(g, axis=0).astype(dbias_ref.dtype)


def _ln_fwd_call(x2, scale, bias, eps, block_rows):
    padded_rows, h = x2.shape
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((padded_rows, h), x2.dtype),
        grid=(padded_rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2, scale, bias)


def _ln_bwd_call(x2, scale, g2, eps, block_rows):
    padded_rows, h = x2.shape
    dx, dscale, dbias = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((padded_rows, h), jnp.float32),
            jax.ShapeDtypeStruct((h,), jnp.float32),
            jax.ShapeDtypeStruct((h,), jnp.float32),
        ),
        grid=(padded_rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
        ),
    )(x2, scale, g2)
    return dx, dscale, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln_2d(x2, scale, bias, eps, block_rows):
    return _ln_fwd_call(x2, scale, bias, eps, block_rows)


def _ln_2d_fwd(x2, scale, bias, eps, block_rows):
    return _ln_fwd_call(x2, scale, bias, eps, block_rows), (x2, scale)


def _ln_2d_bwd(eps, block_rows, res, g):
    x2, scale = res
    dx, dscale, dbias = _ln_bwd_call(x2, scale, g, eps, block_rows)
    return (dx.astype(x2.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


_ln_2d.defvjp(_ln_2d_fwd, _ln_2d_bwd)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows"))
def layer_norm_pallas(x: jax.Array, scale: jax.Array, bias: jax.Array,
                      eps: float = _EPS, block_rows: int = 256) -> jax.Array:
    """Fused LN over the last dim; leading dims flattened into rows."""
    orig_shape = x.shape
    h = orig_shape[-1]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, h)

    # pad rows to a block multiple
    padded_rows = ((rows + block_rows - 1) // block_rows) * block_rows
    if padded_rows != rows:
        x2 = jnp.pad(x2, ((0, padded_rows - rows), (0, 0)))

    out = _ln_2d(x2, scale, bias, eps, block_rows)
    return out[:rows].reshape(orig_shape)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = _EPS) -> jax.Array:
    if get_backend() == "pallas":
        return layer_norm_pallas(x, scale, bias, eps=eps)
    return layer_norm_xla(x, scale, bias, eps)
