"""HF ViT weight conversion parity (tools/import_vit.py).

A small RANDOM-initialized transformers.ViTModel (no network access) is
converted and its forward compared token-for-token against models/vit.py —
verifying the full weight mapping: patch conv -> patchify matmul, separate
q/k/v -> fused wqkv, layer dicts -> scan-stacked pytree, LN eps, exact GELU.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from vitparticlefiltertracker_tpu.models.vit import vit_forward_tokens  # noqa: E402


def small_hf_vit(seed=0):
    from transformers import ViTConfig, ViTModel

    torch.manual_seed(seed)
    cfg = ViTConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=16,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    return ViTModel(cfg).eval()


def test_converted_forward_matches_torch():
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from import_vit import convert_hf_vit

    model = small_hf_vit()
    params, spec = convert_hf_vit(model)
    spec = spec._replace(dtype=jnp.float32, use_flash_attention=False)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        # HF expects channels-first.
        want = model(
            pixel_values=torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ).last_hidden_state.numpy()

    got = np.asarray(vit_forward_tokens(params, jnp.asarray(x), spec))
    assert got.shape == want.shape  # [2, 1 + 4, 64]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_converted_params_save_load_roundtrip(tmp_path):
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from import_vit import convert_hf_vit

    from vitparticlefiltertracker_tpu.models.params import load_params, save_params

    model = small_hf_vit(seed=1)
    params, spec = convert_hf_vit(model)
    path = str(tmp_path / "hf.npz")
    save_params(path, params)
    loaded = load_params(path)
    spec = spec._replace(dtype=jnp.float32, use_flash_attention=False)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(vit_forward_tokens(params, x, spec)),
        np.asarray(vit_forward_tokens(loaded, x, spec)),
    )
