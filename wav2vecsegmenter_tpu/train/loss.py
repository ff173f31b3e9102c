"""Loss functions as config-instantiable specs.

The reference instantiates torch losses straight from config
(conf/task/*.yaml -> torch.nn.BCEWithLogitsLoss / CrossEntropyLoss /
lib.loss.FocalLoss; train.py:352-374).  The registry maps those `_target_`s
here; each spec is a callable ``(logits, targets) -> per-point loss`` in JAX,
numerically matching its torch counterpart.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class BCEWithLogitsLoss:
    """torch.nn.BCEWithLogitsLoss(reduction='none') with pos_weight.

    loss = (1 + (pw-1)*z) * (log(1+exp(-|x|)) + max(-x, 0)) + x*(1-z)... using
    the numerically-stable torch formulation:
      l = (1-z)*x + (1 + (pw-1)*z) * log(1 + exp(-x))   [stabilized]
    """

    def __init__(self, pos_weight=None, reduction: str = "none", **_ignored):
        self.pos_weight = pos_weight
        self.reduction = reduction

    def with_pos_weight(self, pos_weight):
        """Copy with pos_weight replaced — accepts a traced scalar so the
        jitted train step can take pos_weight as an operand (the reference
        re-derives it from each epoch's regenerated dataset,
        train.py:352-374; a closure-captured value would freeze at epoch 0
        inside jit)."""
        return BCEWithLogitsLoss(pos_weight, self.reduction)

    def __call__(self, logits, targets):
        x, z = logits, targets
        pw = 1.0 if self.pos_weight is None else self.pos_weight
        # log(1 + exp(-x)) stable: max(-x,0) + log1p(exp(-|x|))
        log_sig = -(jnp.maximum(-x, 0) + jnp.log1p(jnp.exp(-jnp.abs(x))))
        log_one_minus_sig = log_sig - x  # log(1-sigmoid(x)) = logsig(-x)
        loss = -(pw * z * log_sig + (1 - z) * log_one_minus_sig)
        return _reduce(loss, self.reduction)


class FocalLoss:
    """Binary focal loss (reference lib/loss.py:6-37)."""

    def __init__(self, pos_weight=0.5, gamma=2.0, reduction="none", **_ignored):
        self.pos_weight = 0.5 if pos_weight is None else pos_weight
        self.gamma = gamma
        self.reduction = reduction

    def with_pos_weight(self, pos_weight):
        """Copy with pos_weight replaced (see BCEWithLogitsLoss)."""
        return FocalLoss(pos_weight, self.gamma, self.reduction)

    def __call__(self, logits, targets):
        bce = BCEWithLogitsLoss(None, "none")(logits, targets)
        p_t = jnp.exp(-bce)
        alpha = (1 - self.pos_weight) + targets * (2 * self.pos_weight - 1)
        f_loss = alpha * (1 - p_t) ** self.gamma * bce
        return _reduce(f_loss, self.reduction)


class CrossEntropyLoss:
    """torch.nn.CrossEntropyLoss(reduction='none') over the last dim of
    logits [N, V] vs integer targets [N]; ignore_index contributes 0."""

    def __init__(self, ignore_index: int = -100, reduction: str = "none",
                 **_ignored):
        self.ignore_index = ignore_index
        self.reduction = reduction

    def __call__(self, logits, targets):
        targets = targets.astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        valid = targets != self.ignore_index
        safe = jnp.where(valid, targets, 0)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        loss = jnp.where(valid, nll, 0.0)
        return _reduce(loss, self.reduction)


class CTCLoss:
    """CTC loss via optax, numerically matching torch.nn.CTCLoss.

    torch's ``reduction='mean'`` divides each example's negative log
    likelihood by its target length clamped to 1 (ATen ctc_loss), THEN
    means over the batch — not a plain mean.  ``example_mask`` restricts
    the batch mean to real rows (static-shape padding rows never existed
    in the reference's dynamic batches)."""

    def __init__(self, blank: int = 0, reduction: str = "mean", **_ignored):
        self.blank = blank
        self.reduction = reduction

    def __call__(self, logits, targets, logit_paddings, label_paddings,
                 example_mask=None):
        import optax

        loss = optax.ctc_loss(
            logits, logit_paddings, targets, label_paddings,
            blank_id=self.blank,
        )
        if self.reduction == "mean":
            tl = jnp.sum(1.0 - label_paddings, axis=-1)
            loss = loss / jnp.maximum(tl, 1.0)
        if example_mask is None:
            if self.reduction == "mean":
                return loss.mean()  # length division already applied
            return _reduce(loss, self.reduction)
        loss = jnp.where(example_mask, loss, 0.0)
        denom = jnp.maximum(example_mask.sum(), 1)
        if self.reduction == "mean":
            return loss.sum() / denom
        if self.reduction == "sum":
            return loss.sum()
        return loss


def _reduce(loss, reduction: str):
    if reduction == "none":
        return loss
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    raise ValueError(reduction)


def moving_average_jax(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Trailing moving average along the last axis (vectorized equivalent of
    reference lib/segment.py:508-522, used for ma_window loss weighting at
    train.py:433-452)."""
    n = x.shape[-1]
    csum = jnp.cumsum(x, axis=-1)
    csum = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    idx = jnp.arange(1, n + 1)
    lo = jnp.maximum(0, idx - window)
    return (jnp.take(csum, idx, axis=-1) - jnp.take(csum, lo, axis=-1)) / (
        idx - lo
    )


def build_loss(loss_conf: dict, pos_class_percentage: float | None = None,
               vocab=None):
    """Build (loss_fn, tag, ma_window) from a task loss config, applying the
    reference's pos_weight auto-derivation (train.py:356-368)."""
    conf = dict(loss_conf)
    target = conf.pop("_target_", "torch.nn.BCEWithLogitsLoss")
    tag = conf.pop("tag", "bce")
    ma_window = conf.pop("ma_window", None) or 0.0
    if tag == "bce":
        if conf.get("pos_weight") is None and pos_class_percentage is not None:
            conf["pos_weight"] = 1.0 - pos_class_percentage
    elif tag in ("ce", "ssl"):
        conf["ignore_index"] = vocab.pad_token_id if vocab else -100
    mapping = {
        "torch.nn.BCEWithLogitsLoss": BCEWithLogitsLoss,
        "lib.loss.FocalLoss": FocalLoss,
        "torch.nn.CrossEntropyLoss": CrossEntropyLoss,
        "torch.nn.CTCLoss": CTCLoss,
    }
    cls = mapping.get(target)
    if cls is None:
        from ..config.registry import resolve_target

        cls = resolve_target(target)
    return cls(**conf), tag, float(ma_window)
