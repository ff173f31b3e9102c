"""Reference .pt checkpoint ingestion: full layout, seg-only layout, orbax
roundtrip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from wav2vecsegmenter_tpu.checkpoints.io import (
    load_model_checkpoint,
    restore_orbax,
    save_orbax,
)

from .test_model_parity import make_hf_model, our_cfg


def _make_torch_shas_state(full: bool):
    """Compose a reference-layout state dict from HF backbone + torch head."""
    model, _ = make_hf_model(True)
    torch.manual_seed(7)
    enc_layer = torch.nn.TransformerEncoderLayer(
        64, nhead=4, activation="gelu", batch_first=True, norm_first=True
    )
    head = torch.nn.ModuleDict({
        "transformer": torch.nn.TransformerEncoder(enc_layer, num_layers=1),
        "layer_norm": torch.nn.LayerNorm(64),
        "output_layer": torch.nn.Linear(64, 1),
    })
    sd = {}
    for k, v in head.state_dict().items():
        sd[(f"seg_model.{k}" if full else k)] = v
    if full:
        for k, v in model.state_dict().items():
            sd[f"wav2vec_model.model.{k}"] = v
    return {"state_dict": sd}, model, head


def _tiny_spec():
    from .helpers import tiny_shas

    m = tiny_shas()
    m.w2v_cfg = our_cfg(True)
    m.d_model = 64
    return m


def test_full_layout_pt(tmp_path):
    ckpt, hf_model, head = _make_torch_shas_state(full=True)
    path = tmp_path / "epoch-1.pt"
    torch.save(ckpt, path)

    model = _tiny_spec()
    params = load_model_checkpoint(model, path)
    assert "wav2vec" in params and "seg" in params
    # spot-check a converted weight
    w = np.asarray(params["seg"]["out"]["w"])
    np.testing.assert_allclose(
        w, head["output_layer"].weight.detach().numpy().T, rtol=1e-6)
    q = np.asarray(params["wav2vec"]["layers"]["attn"]["q"]["w"][0])
    np.testing.assert_allclose(
        q,
        hf_model.encoder.layers[0].attention.q_proj.weight.detach().numpy().T,
        rtol=1e-6)


def test_seg_only_layout_pt_with_random_backbone(tmp_path, monkeypatch):
    ckpt, _, head = _make_torch_shas_state(full=False)
    path = tmp_path / "epoch-2.pt"
    torch.save(ckpt, path)

    model = _tiny_spec()
    # no local HF weights: allow_random fills the backbone
    params = load_model_checkpoint(model, path, allow_random_wav2vec=True)
    assert "wav2vec" in params and "seg" in params
    w = np.asarray(params["seg"]["out"]["w"])
    np.testing.assert_allclose(
        w, head["output_layer"].weight.detach().numpy().T, rtol=1e-6)


def test_seg_only_layout_requires_backbone(tmp_path):
    ckpt, _, _ = _make_torch_shas_state(full=False)
    path = tmp_path / "epoch-3.pt"
    torch.save(ckpt, path)
    model = _tiny_spec()
    with pytest.raises(FileNotFoundError):
        load_model_checkpoint(model, path, allow_random_wav2vec=False)


def test_orbax_roundtrip(tmp_path):
    model = _tiny_spec()
    params = model.init(jax.random.PRNGKey(0))
    save_orbax(tmp_path / "ckpt", params)
    restored = restore_orbax(tmp_path / "ckpt", model)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_headonly_restore(tmp_path):
    """The train loop saves seg-only Orbax epoch ckpts when the backbone is
    frozen (train/loop.py save_ckpt, reference train.py:596-613);
    load_model_checkpoint must complete the tree like the .pt path does."""
    model = _tiny_spec()
    params = model.init(jax.random.PRNGKey(3))
    save_orbax(tmp_path / "epoch-0", {"seg": params["seg"]})

    loaded = load_model_checkpoint(
        model, tmp_path / "epoch-0", allow_random_wav2vec=True)
    assert "wav2vec" in loaded and "seg" in loaded
    for a, b in zip(jax.tree.leaves(params["seg"]),
                    jax.tree.leaves(loaded["seg"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(FileNotFoundError):
        load_model_checkpoint(
            model, tmp_path / "epoch-0", allow_random_wav2vec=False)


def test_torch_export_roundtrip(tmp_path):
    """params -> .pt (reference layout) -> params: identical leaves."""
    from wav2vecsegmenter_tpu.checkpoints.torch_export import (
        export_torch_checkpoint,
    )

    model = _tiny_spec()
    model.finetune_wav2vec = True  # full layout
    params = model.init(jax.random.PRNGKey(5))
    path = export_torch_checkpoint(params, model, tmp_path / "export.pt")

    reloaded = load_model_checkpoint(model, path)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6),
        params["seg"], reloaded["seg"],
    )
    # backbone roundtrip: spot checks across param kinds
    for key_path in (
        ("layers", "attn", "q", "w"),
        ("layers", "ffn", "w1", "b"),
        ("feature_projection", "proj", "w"),
        ("pos_conv", "w_v"),
    ):
        a = params["wav2vec"]
        b = reloaded["wav2vec"]
        for k in key_path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_torch_export_seg_only_layout(tmp_path):
    from wav2vecsegmenter_tpu.checkpoints.torch_export import (
        export_torch_checkpoint,
    )
    from wav2vecsegmenter_tpu.checkpoints.torch_convert import (
        is_full_layout,
        load_torch_state_dict,
    )

    model = _tiny_spec()  # frozen backbone -> seg-only
    params = model.init(jax.random.PRNGKey(6))
    path = export_torch_checkpoint(params, model, tmp_path / "seg.pt")
    sd = load_torch_state_dict(path)
    assert not is_full_layout(sd)
    assert "output_layer.weight" in sd
    assert "transformer.layers.0.self_attn.in_proj_weight" in sd
