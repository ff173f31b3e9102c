"""Checkpoint I/O: Orbax for native training state, torch .pt ingestion for
reference checkpoints, and HF-dir loading for pretrained wav2vec2 weights.

Layouts follow the reference contract (train.py:596-613):
  * ``finetune_wav2vec=True``  -> full model state;
  * otherwise                  -> seg-head-only state; the wav2vec2 weights
    are re-materialized from the pretrained source at load time
    (inference.py:51-54, segment.py:48-51).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import jax

from ..models.wav2vec2 import Wav2Vec2Config
from .torch_convert import (
    convert_reference_checkpoint,
    is_full_layout,
    load_hf_pretrained_dir,
    load_torch_state_dict,
)

logger = logging.getLogger(__name__)


def _hf_local_snapshot(model_name: str) -> Path | None:
    """Locate a locally cached/downloaded HF model dir (no network)."""
    candidates = []
    hf_home = os.environ.get("HF_HOME", os.path.expanduser("~/.cache/huggingface"))
    repo_dir = Path(hf_home) / "hub" / ("models--" + model_name.replace("/", "--"))
    if repo_dir.exists():
        snaps = sorted((repo_dir / "snapshots").glob("*"))
        candidates += snaps
    candidates.append(Path(model_name))  # explicit local dir
    for c in candidates:
        if c.is_dir() and (
            (c / "pytorch_model.bin").exists() or (c / "model.safetensors").exists()
        ):
            return c
    return None


def load_wav2vec2_pretrained(model_name: str, cfg: Wav2Vec2Config,
                             allow_random: bool = False,
                             rng_seed: int = 0) -> dict:
    snap = _hf_local_snapshot(model_name)
    if snap is not None:
        logger.info("Loading wav2vec2 weights from %s", snap)
        return load_hf_pretrained_dir(snap, cfg)
    if allow_random:
        logger.warning(
            "No local weights for %s — using RANDOM wav2vec2 init "
            "(allow_random=True).", model_name)
        from ..models.wav2vec2 import init_wav2vec2_params

        return init_wav2vec2_params(jax.random.PRNGKey(rng_seed), cfg)
    raise FileNotFoundError(
        f"No local HF weights found for '{model_name}'. Place the model under "
        f"$HF_HOME/hub or pass a local directory path."
    )


def load_model_checkpoint(model, ckpt_path: str | Path,
                          allow_random_wav2vec: bool = False) -> dict:
    """Load params for ``model`` (a SHAS-family spec) from either a torch .pt
    (reference format, both layouts) or an Orbax directory.

    Both sources come in two layouts (reference train.py:596-613): the FULL
    model state when the backbone was fine-tuned, or the seg head only when
    it was frozen — our train loop mirrors that for its Orbax epoch ckpts
    (train/loop.py save_ckpt), so the head-only completion (backbone weights
    re-loaded from the pretrained source) applies to both formats."""
    ckpt_path = Path(ckpt_path)
    if ckpt_path.is_dir():  # orbax
        template = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
        on_disk = set(_orbax_top_keys(ckpt_path))
        if on_disk >= set(template.keys()):
            return restore_orbax(ckpt_path, template=template)
        sub = {k: v for k, v in template.items() if k in on_disk}
        params = restore_orbax(ckpt_path, template=sub)
        return _complete_headonly_params(params, model, allow_random_wav2vec)

    sd = load_torch_state_dict(ckpt_path)
    if is_full_layout(sd):
        return convert_reference_checkpoint(sd, model)
    params = convert_reference_checkpoint(sd, model)  # {'seg': ...}
    return _complete_headonly_params(params, model, allow_random_wav2vec)


def _orbax_top_keys(path: Path) -> list:
    """Top-level keys of the pytree stored in an Orbax directory."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        md = ckptr.metadata(Path(path).absolute())
    return list(md.item_metadata.tree.keys())


def _complete_headonly_params(params: dict, model,
                              allow_random_wav2vec: bool) -> dict:
    """Fill a head-only checkpoint ({'seg': ...}) up to the full param tree
    from the pretrained wav2vec2 source (reference inference.py loads the
    backbone from HF when the ckpt only carries the classifier)."""
    is_ssl = hasattr(model, "ctc_vocab_size")
    snap = _hf_local_snapshot(model.wav2vec_model_name)
    if is_ssl and snap is not None:
        # SSL variant: the ForCTC pretrained dir also provides the final
        # encoder LN and the lm_head (reference lib/models.py:488-507).
        # setdefault per key: subtrees the checkpoint DID carry (e.g. a
        # fine-tuned backbone restored by the partial-Orbax path) must not
        # be overwritten by pretrained weights.
        from .torch_convert import convert_hf_for_ctc

        sd_hf = _load_hf_state_dict(snap)
        for k, v in convert_hf_for_ctc(sd_hf, model.w2v_cfg).items():
            params.setdefault(k, v)
    else:
        if "wav2vec" not in params:
            params["wav2vec"] = load_wav2vec2_pretrained(
                model.wav2vec_model_name, model.w2v_cfg,
                allow_random=allow_random_wav2vec,
            )
        if is_ssl:
            # no pretrained source: random final_ln/lm_head to complete the
            # tree (allow_random path)
            init = model.init(jax.random.PRNGKey(0))
            params.setdefault("final_ln", init["final_ln"])
            params.setdefault("lm_head", init["lm_head"])
    return params


def _load_hf_state_dict(model_dir: Path) -> dict:
    st_path = model_dir / "model.safetensors"
    bin_path = model_dir / "pytorch_model.bin"
    if st_path.exists():
        from safetensors.numpy import load_file

        return load_file(str(st_path))
    return load_torch_state_dict(bin_path)


# ---------------------------------------------------------------------------
# Orbax
# ---------------------------------------------------------------------------

def save_orbax(path: str | Path, tree) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def restore_orbax(path: str | Path, model=None, template=None,
                  device=None):
    """Restore a pytree; the template carries concrete single-device
    shardings (a checkpoint saved from a CPU process is otherwise
    unrestorable in a TPU process — orbax can't reconstruct shardings across
    backends)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if template is None and model is not None:
            template = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
        if template is not None:
            dev = device or jax.devices()[0]
            sharding = jax.sharding.SingleDeviceSharding(dev)
            template = jax.tree.map(
                lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                               sharding=sharding),
                template,
            )
            return ckptr.restore(path, template)
        return ckptr.restore(path)
