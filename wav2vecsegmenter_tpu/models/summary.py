"""Model summary: per-module parameter table from a params pytree.

Equivalent of the torchinfo.summary startup sanity check the reference logs
(train.py:299-309) — shapes and counts per top-level module, trainable
status from the model's LNA mask.
"""

from __future__ import annotations

import numpy as np


def _count(tree) -> int:
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


def summarize(params: dict, mask: dict | None = None) -> str:
    """Render a parameter table; mask (0/1 pytree) marks trainable counts."""
    import jax

    lines = [f"{'module':<40}{'params':>14}{'trainable':>14}"]
    lines.append("-" * 68)
    total, total_train = 0, 0

    def trainable_count(sub_params, sub_mask) -> int:
        if sub_mask is None:
            return 0
        total = 0
        for p_leaf, m_leaf in zip(jax.tree.leaves(sub_params),
                                  jax.tree.leaves(sub_mask)):
            m = np.broadcast_to(np.asarray(m_leaf), p_leaf.shape)
            total += int(np.sum(m))
        return total

    # summarize at module granularity (depth 2), accumulate leaves below
    def walk_modules(node, mask_node, prefix):
        nonlocal total, total_train
        if isinstance(node, dict) and prefix.count(".") < 1:
            for k, v in node.items():
                walk_modules(v, None if mask_node is None else mask_node.get(k)
                             if isinstance(mask_node, dict) else None,
                             f"{prefix}.{k}" if prefix else k)
            return
        n = _count(node)
        t = trainable_count(node, mask_node) if mask_node is not None else n
        total += n
        total_train += t
        lines.append(f"{prefix:<40}{n:>14,}{t:>14,}")

    walk_modules(params, mask, "")
    lines.append("-" * 68)
    lines.append(f"{'total':<40}{total:>14,}{total_train:>14,}")
    return "\n".join(lines)
