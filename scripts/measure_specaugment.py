"""Measure SpecAugment time-mask statistics: ours vs HF _compute_mask_indices.

Backs the PARITY.md "SpecAugment statistics" entry with data (1k draws each):
per-row mean/std of masked-frame count and span count, for a full row, a
padded row and a tiny row at the production window geometry (T=999, p=0.05,
L=10, min_masks=2).

Run: python scripts/measure_specaugment.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# the axon sitecustomize overrides JAX_PLATFORMS at interpreter start —
# ad-hoc scripts must pin CPU via jax.config (CLAUDE.md)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

T, L, PROB, MIN_MASKS = 999, 10, 0.05, 2
LENGTHS = np.array([999, 781, 95], np.int64)
N = 1000


def hf_draws():
    import torch
    from transformers.models.wav2vec2.modeling_wav2vec2 import (
        _compute_mask_indices,
    )

    am = torch.from_numpy(
        (np.arange(T)[None, :] < LENGTHS[:, None]).astype(np.int64))
    np.random.seed(0)
    return np.stack([
        _compute_mask_indices((len(LENGTHS), T), PROB, L,
                              attention_mask=am, min_masks=MIN_MASKS)
        for _ in range(N)
    ])


def our_draws():
    import jax
    import jax.numpy as jnp

    from wav2vecsegmenter_tpu.models.wav2vec2 import sample_time_mask

    fl = jnp.asarray(LENGTHS, jnp.int32)

    @jax.jit
    def many(keys):
        return jax.vmap(
            lambda k: sample_time_mask(k, len(LENGTHS), T, PROB, L,
                                       frame_lengths=fl,
                                       min_masks=MIN_MASKS))(keys)

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    out = [np.asarray(many(keys[i:i + 100])) for i in range(0, N, 100)]
    return np.concatenate(out)


def span_counts(masks_row):  # [n, T] -> [n] number of contiguous runs
    d = np.diff(masks_row.astype(np.int8), axis=-1)
    return (d == 1).sum(-1) + masks_row[:, :1].sum(-1)


def main():
    hf, us = hf_draws(), our_draws()
    print(f"T={T} L={L} prob={PROB} min_masks={MIN_MASKS}, {N} draws")
    print(f"{'row(len)':>10} | {'HF frames':>16} | {'ours frames':>16} | "
          f"{'HF runs':>12} | {'ours runs':>12}")
    for r, ln in enumerate(LENGTHS):
        ch, cu = hf[:, r].sum(-1), us[:, r].sum(-1)
        rh, ru = span_counts(hf[:, r]), span_counts(us[:, r])
        print(f"{ln:>10} | {ch.mean():7.2f}±{ch.std():6.2f} | "
              f"{cu.mean():7.2f}±{cu.std():6.2f} | "
              f"{rh.mean():5.2f}±{rh.std():4.2f} | "
              f"{ru.mean():5.2f}±{ru.std():4.2f}")
        assert not us[:, r, ln:].any()


if __name__ == "__main__":
    main()
