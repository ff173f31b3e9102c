#!/usr/bin/env python
"""A/B microbench: channels-last (current) vs channels-first conv stack.

The conv stack runs ~93 ms of the ~217 ms per-16-window-batch forward and
its GEMMs are issue-limited at N=512 output lanes (PERF.md "Known remaining
headroom").  Hypothesis: transposing the GEMM so the huge time dimension is
the lane (N) dim — out[O, B*T'] = Wfold[O, s*C] @ Xfold[s*C, B*T'] — keeps
M=512 output channels in sublanes and gives XLA wide-N GEMMs with zero FLOP
inflation (unlike the rejected output-grouping rewrite).  Cost: the
stride-fold is no longer a free reshape; each layer needs a [B,C,T/s,s] ->
[B,C,s,T/s] transpose that XLA may or may not fuse into the epilogue.

Methodology per CLAUDE.md: data generated on device, reps looped inside ONE
jit via lax.scan with a scalar carry, wall timed over the scan; first a
numerics cross-check between the two stacks.

Run on TPU (axon picks the TPU by default for ad-hoc scripts):
  timeout 580 python scripts/bench_conv_cf.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPS = int(os.environ.get("REPS", 20))
BATCH = int(os.environ.get("BATCH", 16))
SECS = float(os.environ.get("SECS", 20.0))


def main():
    import jax
    if os.environ.get("FORCE_CPU"):
        # must happen before anything initializes the backend
        jax.config.update("jax_platforms", "cpu")
    else:
        from wav2vecsegmenter_tpu.core.runtime import setup_compilation_cache

        setup_compilation_cache()
    import jax.numpy as jnp

    from wav2vecsegmenter_tpu.models.wav2vec2 import (
        Wav2Vec2Config, feature_extractor)
    from wav2vecsegmenter_tpu.ops.layernorm import bias_layer_norm_gelu

    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = Wav2Vec2Config()
    L = int(16000 * SECS)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 64)
    convs = []
    ki = 0
    for i, (c_out, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)):
        c_in = 1 if i == 0 else cfg.conv_dim[i - 1]
        layer = {
            "w": jax.random.normal(ks[ki], (k, c_in, c_out), jnp.float32)
            * (1.0 / np.sqrt(k * c_in)),
            "b": jax.random.normal(ks[ki + 1], (c_out,), jnp.float32) * 0.1,
            "ln": {
                "scale": 1.0 + 0.1 * jax.random.normal(
                    ks[ki + 2], (c_out,), jnp.float32),
                "bias": 0.1 * jax.random.normal(
                    ks[ki + 3], (c_out,), jnp.float32),
            },
        }
        ki += 4
        convs.append(layer)
    params = {"feature_extractor": {"convs": convs}}
    audio = jax.random.normal(ks[ki], (BATCH, L), jnp.float32) * 0.1

    # ---------------- channels-first prototype ----------------
    def _fold_cf(x_cf, stride, t_out, n_taps):
        # x_cf [B, C, T] -> yf [B, stride*C, n_taps + t_out - 1] with
        # yf[b, j*C + c, t'] = x_cf[b, c, s*t' + j]  (same (j, c) fold order
        # as the channels-last version, so partial-tap zero rows pad the end)
        b, c, t = x_cf.shape
        t_need = (n_taps + t_out - 1) * stride
        if t_need > t:
            x_cf = jnp.pad(x_cf, ((0, 0), (0, 0), (0, t_need - t)))
        elif t_need < t:
            x_cf = x_cf[:, :, :t_need]
        y4 = x_cf.reshape(b, c, t_need // stride, stride)
        return jnp.transpose(y4, (0, 3, 1, 2)).reshape(
            b, stride * c, t_need // stride)

    def _conv_cf(x_cf, w, stride, compute_dtype):
        # x_cf [B, C, T], w [k, C, O] -> out [B, O, T']
        b, c, t = x_cf.shape
        k, _, o = w.shape
        t_out = (t - k) // stride + 1
        n_taps = -(-k // stride)
        yf = _fold_cf(x_cf, stride, t_out, n_taps).astype(compute_dtype)
        w = w.astype(compute_dtype)
        if stride * c <= 64:
            # tiny-K raw-audio layer: concat taps into one GEMM
            z = jnp.concatenate(
                [jax.lax.slice_in_dim(yf, p, p + t_out, 1, axis=2)
                 for p in range(n_taps)], axis=1)
            # wf ordering must match concat: tap-major then (j, c)
            w_taps = []
            for p in range(n_taps):
                j_hi = min(stride, k - p * stride)
                wt = w[p * stride: p * stride + j_hi].reshape(j_hi * c, o)
                if j_hi < stride:
                    wt = jnp.pad(wt, ((0, (stride - j_hi) * c), (0, 0)))
                w_taps.append(wt)
            wf = jnp.concatenate(w_taps, axis=0)
            out = jax.lax.dot_general(
                wf, z, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [O, B, T']
            return jnp.transpose(out, (1, 0, 2)).astype(compute_dtype)
        acc = None
        for p in range(n_taps):
            j_hi = min(stride, k - p * stride)
            # wf_tap[j*C + c, o] = w[p*s + j, c, o]
            wt = w[p * stride: p * stride + j_hi].reshape(j_hi * c, o)
            if j_hi < stride:
                wt = jnp.pad(wt, ((0, (stride - j_hi) * c), (0, 0)))
            yp = jax.lax.slice_in_dim(yf, p, p + t_out, 1, axis=2)
            term = jax.lax.dot_general(
                wt, yp, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [O, B, T']
            acc = term if acc is None else acc + term
        return jnp.transpose(acc, (1, 0, 2)).astype(compute_dtype)

    def fe_cf(params, audio, cfg, compute_dtype):
        x = audio[:, None, :].astype(compute_dtype)  # [B, 1, T]
        for i, layer in enumerate(params["feature_extractor"]["convs"]):
            w = layer["w"].astype(compute_dtype)
            x = _conv_cf(x, w, cfg.conv_stride[i], compute_dtype)
            # epilogue channels-first: bias + LN over channel axis + GELU
            x32 = x.astype(jnp.float32) + layer["b"][None, :, None]
            mean = jnp.mean(x32, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=1, keepdims=True)
            x32 = (x32 - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
            x32 = x32 * layer["ln"]["scale"][None, :, None] \
                + layer["ln"]["bias"][None, :, None]
            x = jax.nn.gelu(x32, approximate=False).astype(compute_dtype)
        return jnp.transpose(x, (0, 2, 1))  # [B, T', C]

    # ------------- channels-last with 8-aligned padded t_out -------------
    # Pads each layer's t_out up to a multiple of 8 so [B,T',C] -> [B*T',C]
    # flattens are free bitcasts (T'=63999-style odd extents force physical
    # retiling copies: reshape/pad/slice ~18 ms/batch in the trace).  The
    # garbage tail frames are sliced off at the end; exact for layer-norm
    # mode because LN is per-position over channels.
    def _conv_pad(x, w, stride, compute_dtype, align=8):
        b, t, c = x.shape
        k, _, o = w.shape
        t_out = (t - k) // stride + 1
        t_out_p = -(-t_out // align) * align
        n_taps = -(-k // stride)
        t_need = (n_taps + t_out_p - 1) * stride
        if t_need > t:
            x = jnp.pad(x, ((0, 0), (0, t_need - t), (0, 0)))
        elif t_need < t:
            x = x[:, :t_need]
        y = x.reshape(b, n_taps + t_out_p - 1, stride * c).astype(compute_dtype)
        w = w.astype(compute_dtype)
        if stride * c <= 64:
            z = jnp.concatenate(
                [jax.lax.slice_in_dim(y, p, p + t_out_p, 1, axis=1)
                 for p in range(n_taps)], axis=-1)
            w_full = w.reshape(k * c, o)
            if n_taps * stride > k:
                w_full = jnp.pad(
                    w_full, ((0, (n_taps * stride - k) * c), (0, 0)))
            out = jax.lax.dot_general(
                z, w_full, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return out.astype(compute_dtype), t_out
        acc = None
        for p in range(n_taps):
            j_hi = min(stride, k - p * stride)
            w_tap = w[p * stride: p * stride + j_hi].reshape(j_hi * c, o)
            if j_hi < stride:
                w_tap = jnp.pad(w_tap, ((0, (stride - j_hi) * c), (0, 0)))
            yp = jax.lax.slice_in_dim(y, p, p + t_out_p, 1, axis=1)
            term = jax.lax.dot_general(
                yp, w_tap, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
        return acc.astype(compute_dtype), t_out

    def fe_cur_pad(params, audio, cfg, compute_dtype):
        x = audio[:, :, None].astype(compute_dtype)
        t_real = audio.shape[1]
        for i, layer in enumerate(params["feature_extractor"]["convs"]):
            w = layer["w"].astype(compute_dtype)
            x, _ = _conv_pad(x, w, cfg.conv_stride[i], compute_dtype)
            t_real = (t_real - cfg.conv_kernel[i]) // cfg.conv_stride[i] + 1
            x = bias_layer_norm_gelu(
                x, layer["b"], layer["ln"]["scale"], layer["ln"]["bias"],
                cfg.layer_norm_eps)
        return x[:, :t_real]

    # ------------- channels-first, [C, B, T] carry, aligned -------------
    def _conv_cf2(x, w, stride, compute_dtype, align=8):
        # x [C, B, T], w [k, C, O] -> [O, B, T'p], true t_out returned
        c, b, t = x.shape
        k, _, o = w.shape
        t_out = (t - k) // stride + 1
        t_out_p = -(-t_out // align) * align
        n_taps = -(-k // stride)
        t_need = (n_taps + t_out_p - 1) * stride
        if t_need > t:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, t_need - t)))
        elif t_need < t:
            x = x[:, :, :t_need]
        tf = t_need // stride
        # fold (j, c)-order: yf[j*C + c, b, t'] = x[c, b, s*t' + j]
        y4 = x.reshape(c, b, tf, stride)
        yf = jnp.transpose(y4, (3, 0, 1, 2)).reshape(
            stride * c, b, tf).astype(compute_dtype)
        w = w.astype(compute_dtype)
        if stride * c <= 64:
            z = jnp.concatenate(
                [jax.lax.slice_in_dim(yf, p, p + t_out_p, 1, axis=2)
                 for p in range(n_taps)], axis=0)
            w_taps = []
            for p in range(n_taps):
                j_hi = min(stride, k - p * stride)
                wt = w[p * stride: p * stride + j_hi].reshape(j_hi * c, o)
                if j_hi < stride:
                    wt = jnp.pad(wt, ((0, (stride - j_hi) * c), (0, 0)))
                w_taps.append(wt)
            wf = jnp.concatenate(w_taps, axis=0)
            out = jax.lax.dot_general(
                wf, z, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [O, B, T'p]
            return out.astype(compute_dtype), t_out
        acc = None
        for p in range(n_taps):
            j_hi = min(stride, k - p * stride)
            wt = w[p * stride: p * stride + j_hi].reshape(j_hi * c, o)
            if j_hi < stride:
                wt = jnp.pad(wt, ((0, (stride - j_hi) * c), (0, 0)))
            yp = jax.lax.slice_in_dim(yf, p, p + t_out_p, 1, axis=2)
            term = jax.lax.dot_general(
                wt, yp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [O, B, T'p]
            acc = term if acc is None else acc + term
        return acc.astype(compute_dtype), t_out

    def fe_cf2(params, audio, cfg, compute_dtype):
        x = audio[None, :, :].astype(compute_dtype)  # [1, B, T]
        t_real = audio.shape[1]
        for i, layer in enumerate(params["feature_extractor"]["convs"]):
            w = layer["w"].astype(compute_dtype)
            x, _ = _conv_cf2(x, w, cfg.conv_stride[i], compute_dtype)
            t_real = (t_real - cfg.conv_kernel[i]) // cfg.conv_stride[i] + 1
            x32 = x.astype(jnp.float32) + layer["b"][:, None, None]
            mean = jnp.mean(x32, axis=0, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=0, keepdims=True)
            x32 = (x32 - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
            x32 = x32 * layer["ln"]["scale"][:, None, None] \
                + layer["ln"]["bias"][:, None, None]
            x = jax.nn.gelu(x32, approximate=False).astype(compute_dtype)
        return jnp.transpose(x[:, :, :t_real], (1, 2, 0))  # [B, T', C]

    fe_cur = jax.jit(lambda p, a: feature_extractor(p, a, cfg, dt))
    fe_new = jax.jit(lambda p, a: fe_cf(p, a, cfg, dt))

    if not os.environ.get("SKIP_CHECK"):
        print("numerics check...", flush=True)
        y_cur = np.asarray(fe_cur(params, audio), dtype=np.float32)
        scale = np.abs(y_cur).mean() + 1e-9
        for nm, fe in (("cf", fe_new),
                       ("cur_pad",
                        jax.jit(lambda p, a: fe_cur_pad(p, a, cfg, dt))),
                       ("cf2", jax.jit(lambda p, a: fe_cf2(p, a, cfg, dt)))):
            y = np.asarray(fe(params, audio), dtype=np.float32)
            d = np.abs(y_cur - y)
            print(f"{nm}: shapes {y_cur.shape} vs {y.shape}; "
                  f"max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
                  f"rel={d.max()/scale:.3e}", flush=True)

    def make_loop(fe2):
        def run(a0):
            def body(carry, _):
                y = fe2(params, a0 + carry)
                return jnp.float32(0.0) * y[0, 0, 0].astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
            return c
        return jax.jit(run)

    profile_dir = os.environ.get("PROFILE_DIR")
    arms = os.environ.get("ARMS", "cur,cf,cur_pad,cf2").split(",")
    all_arms = (("cur", lambda p, a: feature_extractor(p, a, cfg, dt)),
                ("cf", lambda p, a: fe_cf(p, a, cfg, dt)),
                ("cur_pad", lambda p, a: fe_cur_pad(p, a, cfg, dt)),
                ("cf2", lambda p, a: fe_cf2(p, a, cfg, dt)))
    for name, fe2 in ((n, f) for n, f in all_arms if n in arms):
        fn = make_loop(fe2)
        t0 = time.time()
        np.asarray(fn(audio))
        t1 = time.time()
        walls = []
        for _ in range(3):
            s = time.time()
            np.asarray(fn(audio))
            walls.append(time.time() - s)
        best = min(walls)
        print(f"{name}: compile+first {t1 - t0:.1f}s, "
              f"best {best:.3f}s/{REPS} reps = {best / REPS * 1e3:.2f} ms/batch",
              flush=True)
        if profile_dir:
            d = os.path.join(profile_dir, name.strip())
            with jax.profiler.trace(d):
                np.asarray(fn(audio))
            _dump_ops(d, REPS)


def _dump_ops(trace_dir, reps):
    """Aggregate the XLA Ops line per op name, print ms/rep for the top ops."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from pathlib import Path

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pb = sorted(Path(trace_dir).rglob("*.xplane.pb"))[-1]
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(pb.read_bytes())
    for plane in sp.planes:
        if "TPU:0" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = {}
            meta = plane.event_metadata
            for e in line.events:
                nm = meta[e.metadata_id].name
                # strip trailing fusion numbering for grouping
                base = nm.rstrip("0123456789.")
                acc = agg.setdefault(base, [0.0, 0])
                acc[0] += e.duration_ps / 1e9  # -> ms
                acc[1] += 1
            total = sum(v[0] for v in agg.values())
            print(f"  device busy {total / reps:.2f} ms/rep; top ops:")
            for nm, (ms, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:14]:
                print(f"    {ms / reps:7.3f} ms/rep  x{n:<5d} {nm[:90]}")
            return


if __name__ == "__main__":
    main()
