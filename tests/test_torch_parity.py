"""Numerical parity: forward logits and attention weights vs the Torch reference.

Loads the reference implementation straight from
`/root/reference/healnet/models/healnet.py` (read-only), transfers its weights
into the Flax model via :mod:`healnet_tpu.compat.torch_import`, and checks
logits / embeddings / attention maps agree to fp32 tolerance — the fidelity
requirement of BASELINE.json ("forward logits + per-modality attention weights
match Torch reference to tolerance").
"""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from healnet_tpu.models import HealNetModule
from healnet_tpu.compat import params_from_torch_state_dict

REF_PATH = "/root/reference/healnet/models/healnet.py"


@pytest.fixture(scope="module")
def ref_healnet():
    spec = importlib.util.spec_from_file_location("ref_healnet", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_healnet"] = mod
    spec.loader.exec_module(mod)
    return mod


def _build_pair(ref_healnet, **hp):
    torch.manual_seed(0)
    tm = ref_healnet.HealNet(**hp)
    tm.eval()
    jm = HealNetModule(
        n_modalities=hp["n_modalities"],
        channel_dims=tuple(hp["channel_dims"]),
        num_spatial_axes=tuple(hp["num_spatial_axes"]),
        out_dims=hp["out_dims"],
        depth=hp.get("depth", 3),
        num_freq_bands=hp.get("num_freq_bands", 2),
        max_freq=hp.get("max_freq", 10.0),
        l_c=hp.get("l_c", 128),
        l_d=hp.get("l_d", 128),
        x_heads=hp.get("x_heads", 8),
        l_heads=hp.get("l_heads", 8),
        cross_dim_head=hp.get("cross_dim_head", 64),
        latent_dim_head=hp.get("latent_dim_head", 64),
        weight_tie_layers=hp.get("weight_tie_layers", False),
        fourier_encode_data=hp.get("fourier_encode_data", True),
        self_per_cross_attn=hp.get("self_per_cross_attn", 1),
        snn=hp.get("snn", True),
    )
    params = params_from_torch_state_dict(tm.state_dict(), jm)
    return tm, jm, params


HP_SMALL = dict(
    n_modalities=2,
    channel_dims=[67, 5],
    num_spatial_axes=[1, 2],
    out_dims=4,
    depth=2,
    l_c=8,
    l_d=16,
    x_heads=2,
    l_heads=2,
    cross_dim_head=8,
    latent_dim_head=8,
    self_per_cross_attn=1,
)


def _inputs(rng, b=3):
    tab = rng.normal(size=(b, 1, 67)).astype(np.float32)
    img = rng.normal(size=(b, 7, 9, 5)).astype(np.float32)
    return tab, img


def test_forward_parity_bimodal(ref_healnet, rng):
    tm, jm, params = _build_pair(ref_healnet, **HP_SMALL)
    tab, img = _inputs(rng)
    with torch.no_grad():
        ref = tm([torch.tensor(tab), torch.tensor(img)]).numpy()
    ours = np.asarray(jm.apply({"params": params}, (jnp.asarray(tab), jnp.asarray(img))))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_embeddings_parity(ref_healnet, rng):
    tm, jm, params = _build_pair(ref_healnet, **HP_SMALL)
    tab, img = _inputs(rng)
    with torch.no_grad():
        ref = tm([torch.tensor(tab), torch.tensor(img)], return_embeddings=True).numpy()
    ours = np.asarray(
        jm.apply(
            {"params": params},
            (jnp.asarray(tab), jnp.asarray(img)),
            return_embeddings=True,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_forward_parity_weight_tied(ref_healnet, rng):
    hp = dict(HP_SMALL, weight_tie_layers=True, depth=3)
    tm, jm, params = _build_pair(ref_healnet, **hp)
    tab, img = _inputs(rng)
    with torch.no_grad():
        ref = tm([torch.tensor(tab), torch.tensor(img)]).numpy()
    ours = np.asarray(jm.apply({"params": params}, (jnp.asarray(tab), jnp.asarray(img))))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_forward_parity_no_self_attn_snn(ref_healnet, rng):
    # best_hyperparams configs use self_per_cross_attn=0, snn=True, 1 cross head
    hp = dict(HP_SMALL, self_per_cross_attn=0, x_heads=1, snn=True)
    tm, jm, params = _build_pair(ref_healnet, **hp)
    tab, img = _inputs(rng)
    with torch.no_grad():
        ref = tm([torch.tensor(tab), torch.tensor(img)]).numpy()
    ours = np.asarray(jm.apply({"params": params}, (jnp.asarray(tab), jnp.asarray(img))))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_forward_parity_trimodal_3d(ref_healnet, rng):
    hp = dict(
        HP_SMALL,
        n_modalities=3,
        channel_dims=[67, 5, 3],
        num_spatial_axes=[1, 2, 3],
    )
    tm, jm, params = _build_pair(ref_healnet, **hp)
    tab, img = _inputs(rng)
    vol = rng.normal(size=(3, 4, 5, 6, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm([torch.tensor(tab), torch.tensor(img), torch.tensor(vol)]).numpy()
    ours = np.asarray(
        jm.apply(
            {"params": params},
            (jnp.asarray(tab), jnp.asarray(img), jnp.asarray(vol)),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_missing_modality_parity(ref_healnet, rng):
    """Our presence-gating must reproduce the reference's None-skip behaviour."""
    tm, jm, params = _build_pair(ref_healnet, **HP_SMALL)
    tab, img = _inputs(rng)
    with torch.no_grad():
        ref = tm([torch.tensor(tab), None]).numpy()
    b = tab.shape[0]
    presence = jnp.asarray(np.array([[1.0, 0.0]] * b, dtype=np.float32))
    placeholder = jnp.zeros((b, 1, 1, 5), dtype=jnp.float32)
    ours = np.asarray(
        jm.apply(
            {"params": params},
            (jnp.asarray(tab), placeholder),
            presence=presence,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_attention_weights_parity(ref_healnet, rng):
    tm, jm, params = _build_pair(ref_healnet, **HP_SMALL)
    tab, img = _inputs(rng)
    with torch.no_grad():
        tm([torch.tensor(tab), torch.tensor(img)])
    ref_weights = [w.numpy() for w in tm.get_attention_weights()]

    from healnet_tpu import HealNet

    wrapper = HealNet(
        n_modalities=2,
        channel_dims=[67, 5],
        num_spatial_axes=[1, 2],
        out_dims=4,
        depth=2,
        l_c=8,
        l_d=16,
        x_heads=2,
        l_heads=2,
        cross_dim_head=8,
        latent_dim_head=8,
        self_per_cross_attn=1,
    )
    wrapper.params = jax.tree_util.tree_map(jnp.asarray, params)
    wrapper([tab, img])
    our_weights = wrapper.get_attention_weights()

    assert len(our_weights) == len(ref_weights)
    for ours, theirs in zip(our_weights, ref_weights):
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_masked_forward_parity(ref_healnet, rng):
    """Reference applies one mask to every modality context; token counts must match."""
    hp = dict(HP_SMALL, n_modalities=1, channel_dims=[67], num_spatial_axes=[1])
    tm, jm, params = _build_pair(ref_healnet, **hp)
    b, tokens = 3, 1
    tab = rng.normal(size=(b, tokens, 67)).astype(np.float32)
    mask = np.ones((b, tokens), dtype=bool)
    with torch.no_grad():
        ref = tm([torch.tensor(tab)], mask=torch.tensor(mask)).numpy()
    ours = np.asarray(
        jm.apply(
            {"params": params},
            (jnp.asarray(tab),),
            kv_masks=(jnp.asarray(mask),),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
