"""Opt-in REAL-TPU smoke tests (set W2VSEG_TPU_TESTS=1 to enable).

The regular suite runs the Pallas kernels in interpret mode on CPU, which
does NOT enforce Mosaic's lowering rules (e.g. the last two dims of every
BlockSpec block must divide (8, 128) or equal the array dims) — two kernels
passed interpret mode but failed to lower on hardware during development.
These tests compile the kernels on the actual TPU in a subprocess (the
conftest pins this process to the CPU platform, so hardware checks must
re-exec without JAX_PLATFORMS).
"""

import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("W2VSEG_TPU_TESTS"),
    reason="real-TPU smoke disabled (set W2VSEG_TPU_TESTS=1)",
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_on_tpu(body: str, timeout: int = 900,
                extra_env: dict | None = None) -> str:
    env = dict(os.environ)
    if extra_env:
        env.update(extra_env)
    # conftest pinned this process to cpu; the child needs the real TPU
    # platform.  Experimental platforms (e.g. the axon tunnel) are excluded
    # from jax auto-selection, so they must be named explicitly:
    # W2VSEG_TPU_PLATFORM=axon on that rig, default "tpu" elsewhere.
    env["JAX_PLATFORMS"] = os.environ.get("W2VSEG_TPU_PLATFORM", "tpu")
    env["XLA_FLAGS"] = " ".join(
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    # PREPEND the repo — the existing PYTHONPATH may carry the platform
    # plugin's sitecustomize dir (clobbering it loses the TPU platform)
    prior = os.environ.get("PYTHONPATH", "")
    env["PYTHONPATH"] = _REPO + (os.pathsep + prior if prior else "")
    script = textwrap.dedent(body)
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    return r.stdout


def test_kernels_lower_and_match_on_tpu():
    out = _run_on_tpu("""
        import numpy as np, jax, jax.numpy as jnp
        assert jax.default_backend() == "tpu", jax.default_backend()
        from wav2vecsegmenter_tpu.ops.attention import (
            attention_pallas, attention_xla)
        from wav2vecsegmenter_tpu.ops.layernorm import (
            _bln_gelu_xla, bias_layer_norm_gelu, layer_norm_pallas,
            layer_norm_xla)
        rng = np.random.RandomState(0)

        # attention: self (odd T) + cross (tq != tk), fwd + grad
        for tq, tk in ((99, 99), (37, 300)):
            q = jax.device_put(rng.randn(2, 4, tq, 64).astype(np.float32))
            k = jax.device_put(rng.randn(2, 4, tk, 64).astype(np.float32))
            v = jax.device_put(rng.randn(2, 4, tk, 64).astype(np.float32))
            mask = jax.device_put(
                np.arange(tk)[None, :] < np.array([tk, tk - 17])[:, None])
            want = np.asarray(attention_xla(q, k, v, mask, 0.125))
            got = np.asarray(jax.jit(
                lambda q, k, v: attention_pallas(q, k, v, mask, 0.125)
            )(q, k, v))
            np.testing.assert_allclose(got, want, atol=5e-3)
            g = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
                attention_pallas(q, k, v, mask, 0.125) ** 2),
                argnums=(0, 1, 2)))(q, k, v)
            assert all(bool(jnp.isfinite(a).all()) for a in g)

        # packed-layout attention (r5): head-PAIR blocks (d=64) and
        # one-head blocks (d=128), bf16 production dtype, off the fused
        # QKV layout [B, T, 3H]
        from wav2vecsegmenter_tpu.ops.attention import attention_packed
        for nh, d in ((4, 64), (2, 128)):
            h = nh * d
            proj = jax.device_put(
                (rng.randn(2, 99, 3 * h) * 0.3).astype(np.float32)
            ).astype(jnp.bfloat16)
            mask = jax.device_put(
                np.arange(99)[None, :] < np.array([99, 82])[:, None])
            qkv = np.asarray(proj, np.float32).reshape(2, 99, 3, nh, d)
            qm = jnp.asarray(qkv[:, :, 0].transpose(0, 2, 1, 3))
            km = jnp.asarray(qkv[:, :, 1].transpose(0, 2, 1, 3))
            want = np.asarray(attention_xla(
                qm, km, jnp.asarray(qkv[:, :, 2].transpose(0, 2, 1, 3)),
                mask, d ** -0.5))
            want = want.transpose(0, 2, 1, 3).reshape(2, 99, h)
            got = np.asarray(jax.jit(
                lambda p: attention_packed(p, mask, nh, d ** -0.5))(proj),
                np.float32)
            np.testing.assert_allclose(got, want, atol=2e-2)

        # fused FFN kernel (r5): bf16 production dtype, ragged final
        # row block (999 % 256 != 0 in production; 137 % 64 here)
        from wav2vecsegmenter_tpu.ops.ffn import _ffn_fused, ffn_xla
        xf = jax.device_put(
            (rng.randn(2, 137, 256) * 0.3).astype(np.float32)
        ).astype(jnp.bfloat16)
        w1 = jax.device_put((rng.randn(256, 512) * 0.05).astype(np.float32)
                            ).astype(jnp.bfloat16)
        b1 = jax.device_put(rng.randn(512).astype(np.float32)
                            ).astype(jnp.bfloat16)
        w2 = jax.device_put((rng.randn(512, 256) * 0.05).astype(np.float32)
                            ).astype(jnp.bfloat16)
        b2 = jax.device_put(rng.randn(256).astype(np.float32)
                            ).astype(jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(jax.jit(
                lambda *a: _ffn_fused(*a, 64))(xf, w1, b1, w2, b2),
                np.float32),
            np.asarray(ffn_xla(xf, w1, b1, w2, b2), np.float32),
            atol=5e-2)

        # fused LayerNorm + conv epilogue
        x = jax.device_put(rng.randn(3, 137, 256).astype(np.float32))
        s = jax.device_put(rng.randn(256).astype(np.float32))
        b = jax.device_put(rng.randn(256).astype(np.float32))
        cb = jax.device_put((rng.randn(256) * 0.1).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(jax.jit(layer_norm_pallas)(x, s, b)),
            np.asarray(layer_norm_xla(x, s, b)), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(jax.jit(bias_layer_norm_gelu)(x, cb, s, b)),
            np.asarray(_bln_gelu_xla(x, cb, s, b, 1e-5)), atol=5e-3)
        print("TPU_KERNEL_SMOKE_OK")
    """)
    assert "TPU_KERNEL_SMOKE_OK" in out


@pytest.mark.parametrize("convwide", ["1", "0"])
def test_convfuse_kernel_lowers_and_matches_on_tpu(convwide):
    """Whole-conv-layer fused kernel on real Mosaic, both default-on paths
    plus the fallback: the 512-ch geometry (CK=1024, O=512; wide-N and
    narrow two-dot variants via W2VSEG_CONVWIDE — captured at convfuse
    import, hence set in the child env) and the tiny-ck raw-audio regime
    (ck=10 EQUAL to the array dim, the other legal Mosaic block shape,
    models/wav2vec2.py:463-484).  pltpu.roll + the clamped halo index map +
    the ragged out grid must survive real lowering, not just interpret
    mode."""
    out = _run_on_tpu("""
        import numpy as np, jax, jax.numpy as jnp
        assert jax.default_backend() == "tpu", jax.default_backend()
        from wav2vecsegmenter_tpu.ops.convfuse import _fused, _xla_ref
        rng = np.random.RandomState(1)
        eps = 1e-5
        # (ck, o, n_taps, t_out): 512-ch 2-tap + 1-tap, then the tiny-ck
        # raw-audio regime (k*c=10 -> ck equals the array dim)
        for ck, o, n_taps, t_out in ((1024, 512, 2, 999),
                                     (1024, 512, 1, 1000),
                                     (10, 512, 1, 1000)):
            tf = t_out + n_taps - 1
            y = jax.device_put(
                (rng.randn(2, tf, ck) * 0.1).astype(np.float32))
            w = jax.device_put(
                (rng.randn(n_taps, ck, o) * 0.03).astype(np.float32))
            cb = jax.device_put((rng.randn(o) * 0.1).astype(np.float32))
            s = jax.device_put(rng.randn(o).astype(np.float32))
            b = jax.device_put(rng.randn(o).astype(np.float32))
            want = np.asarray(_xla_ref(y, w, cb, s, b, eps, t_out))
            got = np.asarray(jax.jit(
                lambda y, w, cb, s, b: _fused(y, w, cb, s, b, eps, t_out,
                                              512))(y, w, cb, s, b))
            np.testing.assert_allclose(got, want, atol=5e-3,
                                       err_msg=str((ck, n_taps, t_out)))
        print("TPU_CONVFUSE_SMOKE_OK")
    """, extra_env={"W2VSEG_CONVWIDE": convwide})
    assert "TPU_CONVFUSE_SMOKE_OK" in out
