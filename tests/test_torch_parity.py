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


def _ref_sample_missing(features, use_omic, mode):
    """The reference's `_sample_missing` routing, replicated verbatim in
    structure (`/root/reference/healnet/main.py:526-541`): every mode returns
    a ONE-element feature list, so the kept tensor runs as modality 0."""
    if mode == "50":
        if use_omic:
            return [features[0]], False
        return [features[1]], True
    if mode == "omic":
        return [features[1]], use_omic
    return [features[0]], use_omic  # "wsi"


@pytest.mark.parametrize("mode", ["50", "omic", "wsi"])
def test_reference_ablation_semantics_parity(ref_healnet, rng, mode):
    """`evaluate(missing_semantics="reference")` computes the SAME function as
    the reference's eval-time ablation harness: the kept tensor is routed
    through modality 0's tower (`main.py:526-541` one-element list +
    `healnet.py:235-239` except:pass), checked here against the live Torch
    model batch-for-batch on both loss and c-index."""
    from healnet_tpu.train import SurvivalTrainer
    from healnet_tpu.train.losses import nll_loss as jax_nll
    from healnet_tpu.train.metrics import concordance_index_censored as cic

    hp = dict(
        n_modalities=2, channel_dims=[10, 10], num_spatial_axes=[1, 1],
        out_dims=4, depth=2, l_c=6, l_d=12, x_heads=1, l_heads=2,
        cross_dim_head=6, latent_dim_head=6, self_per_cross_attn=0,
        num_freq_bands=2, max_freq=2.0, snn=True,
    )
    tm, jm, params = _build_pair(ref_healnet, **hp)
    n, bs = 8, 4
    omic = rng.normal(size=(n, 1, 10)).astype(np.float32)
    wsi = rng.normal(size=(n, 6, 10)).astype(np.float32)
    y = rng.integers(0, 4, size=n).astype(np.int32)
    cen = rng.integers(0, 2, size=n).astype(np.float32)
    evt = rng.uniform(1, 100, size=n).astype(np.float32)

    # torch side: the reference's own eval routing, batch by batch
    use_omic = True
    t_losses, t_risks = [], []
    for s in range(0, n, bs):
        feats = [torch.tensor(omic[s:s + bs]), torch.tensor(wsi[s:s + bs])]
        feats, use_omic = _ref_sample_missing(feats, use_omic, mode)
        with torch.no_grad():
            logits = tm(list(feats))
        hazards = torch.sigmoid(logits)
        survival = torch.cumprod(1 - hazards, dim=1)
        t_risks.append((-survival.sum(1)).numpy())
        t_losses.append(
            float(jax_nll(
                hazards=jnp.asarray(hazards.numpy()),
                survival=jnp.asarray(survival.numpy()),
                y_disc=jnp.asarray(y[s:s + bs]),
                censorship=jnp.asarray(cen[s:s + bs]),
            ))
        )
    t_risks = np.concatenate(t_risks)
    t_c = cic((1 - cen).astype(bool), evt, t_risks, tied_tol=1e-8)[0]

    trainer = SurvivalTrainer(jm, loss_type="nll", batch_size=bs, epochs=1)
    trainer.params = jax.tree_util.tree_map(jnp.asarray, params)
    data = {"tensors": (omic, wsi), "y_disc": y, "censorship": cen,
            "event_time": evt}
    j_loss, j_c = trainer.evaluate(
        data, missing_mode=mode, missing_semantics="reference"
    )
    assert abs(j_c - t_c) < 1e-6, (j_c, t_c)
    assert abs(j_loss - float(np.mean(t_losses))) < 1e-4, (j_loss, t_losses)


def test_reference_ablation_channel_mismatch_constant(ref_healnet, rng):
    """When the kept tensor's channels don't match modality 0's, the
    reference's tower 0 raises into the blanket except:pass and the latent is
    never updated — constant logits for the whole split. The compat path
    reproduces that (c-index pinned to 0.5 on both sides)."""
    from healnet_tpu.train import SurvivalTrainer
    from healnet_tpu.train.metrics import concordance_index_censored as cic

    hp = dict(
        n_modalities=2, channel_dims=[10, 14], num_spatial_axes=[1, 1],
        out_dims=4, depth=1, l_c=6, l_d=12, x_heads=1, l_heads=2,
        cross_dim_head=6, latent_dim_head=6, self_per_cross_attn=0,
        num_freq_bands=2, max_freq=2.0, snn=True,
    )
    tm, jm, params = _build_pair(ref_healnet, **hp)
    n, bs = 8, 4
    omic = rng.normal(size=(n, 1, 10)).astype(np.float32)
    wsi = rng.normal(size=(n, 6, 14)).astype(np.float32)
    y = rng.integers(0, 4, size=n).astype(np.int32)
    cen = np.zeros(n, np.float32)
    evt = rng.uniform(1, 100, size=n).astype(np.float32)

    with torch.no_grad():
        logits = tm([torch.tensor(wsi[:bs])])  # mode "omic": wsi as slot 0
    assert float(logits.std(0).max()) == 0.0  # reference: constant logits

    trainer = SurvivalTrainer(jm, loss_type="nll", batch_size=bs, epochs=1)
    trainer.params = jax.tree_util.tree_map(jnp.asarray, params)
    data = {"tensors": (omic, wsi), "y_disc": y, "censorship": cen,
            "event_time": evt}
    _, j_c = trainer.evaluate(
        data, missing_mode="omic", missing_semantics="reference"
    )
    assert j_c == pytest.approx(0.5)
