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

    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((padded_rows, h), x.dtype),
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

    return out[:rows].reshape(orig_shape)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = _EPS) -> jax.Array:
    if get_backend() == "pallas":
        return layer_norm_pallas(x, scale, bias, eps=eps)
    return layer_norm_xla(x, scale, bias, eps)
