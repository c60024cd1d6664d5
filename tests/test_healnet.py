"""HealNet model API tests, mirroring the reference suite
(`/root/reference/healnet/tests/test_healnet.py:26-67`) plus missing-modality
and attention-inspection coverage the reference lacks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from healnet_tpu import HealNet
from healnet_tpu.models import attention_module_order
from healnet_tpu.models.layers import Attention
import jax


B = 4
T_C, T_D = 1, 137  # tabular channels/features (small for CPU test speed)
I_H, I_W, I_C = 12, 12, 5
SMALL_HP = dict(l_c=8, l_d=16, x_heads=2, l_heads=2, cross_dim_head=8, latent_dim_head=8, depth=2)


def test_attention_shape(rng):
    latent = jnp.asarray(rng.normal(size=(B, 8, 16)).astype(np.float32))
    query = jnp.asarray(rng.normal(size=(B, T_C, T_D)).astype(np.float32))
    attn = Attention(query_dim=16, context_dim=T_D, heads=2, dim_head=8)
    params = attn.init(jax.random.PRNGKey(0), latent, context=query)
    out, _ = attn.apply(params, latent, context=query)
    assert out.shape == (B, 8, 16)


def test_healnet_unimodal(rng):
    tab = rng.normal(size=(B, T_C, T_D)).astype(np.float32)
    m = HealNet(n_modalities=1, channel_dims=[T_D], num_spatial_axes=[1], out_dims=5, **SMALL_HP)
    logits = m([tab])
    assert logits.shape == (B, 5)


def test_healnet_bimodal(rng):
    tab = rng.normal(size=(B, T_C, T_D)).astype(np.float32)
    img = rng.normal(size=(B, I_H, I_W, I_C)).astype(np.float32)
    m = HealNet(
        n_modalities=2,
        channel_dims=[T_D, I_C],
        num_spatial_axes=[1, 2],
        out_dims=4,
        **SMALL_HP,
    )
    logits = m([tab, img])
    assert logits.shape == (B, 4)


def test_healnet_trimodal_3d(rng):
    tab = rng.normal(size=(2, T_C, 64)).astype(np.float32)
    img = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    vol = rng.normal(size=(2, 4, 6, 6, 3)).astype(np.float32)
    m = HealNet(
        n_modalities=3,
        channel_dims=[64, 3, 3],
        num_spatial_axes=[1, 2, 3],
        out_dims=4,
        **SMALL_HP,
    )
    logits = m([tab, img, vol])
    assert logits.shape == (2, 4)


def test_healnet_misaligned_args_raise():
    with pytest.raises(AssertionError):
        HealNet(
            n_modalities=1,
            channel_dims=[T_D, I_C],
            num_spatial_axes=[1, 1],
            out_dims=4,
        )


def test_missing_modality_forward(rng):
    tab = rng.normal(size=(B, T_C, T_D)).astype(np.float32)
    m = HealNet(
        n_modalities=2,
        channel_dims=[T_D, I_C],
        num_spatial_axes=[1, 2],
        out_dims=4,
        **SMALL_HP,
    )
    logits_full = m([tab, rng.normal(size=(B, I_H, I_W, I_C)).astype(np.float32)])
    logits_missing = m([tab, None])
    assert logits_missing.shape == (B, 4)
    assert np.isfinite(np.asarray(logits_missing)).all()
    # missing modality must change the prediction (its update was gated off)
    assert not np.allclose(np.asarray(logits_full), np.asarray(logits_missing))


def test_return_embeddings(rng):
    tab = rng.normal(size=(B, T_C, T_D)).astype(np.float32)
    m = HealNet(n_modalities=1, channel_dims=[T_D], num_spatial_axes=[1], out_dims=4, **SMALL_HP)
    emb = m([tab], return_embeddings=True)
    assert emb.shape == (B, SMALL_HP["l_c"], SMALL_HP["l_d"])


def test_attention_weights_exposed(rng):
    tab = rng.normal(size=(B, T_C, T_D)).astype(np.float32)
    img = rng.normal(size=(B, I_H, I_W, I_C)).astype(np.float32)
    m = HealNet(
        n_modalities=2,
        channel_dims=[T_D, I_C],
        num_spatial_axes=[1, 2],
        out_dims=4,
        self_per_cross_attn=1,
        **SMALL_HP,
    )
    m([tab, img])
    weights = m.get_attention_weights()
    # depth=2 layers x (2 cross + 1 self) = 6 attention modules, no tying
    assert len(weights) == 6
    # cross-attention weights: (b*h, l_c, context_tokens)
    assert weights[0].shape == (B * 2, 8, T_C)
    assert weights[1].shape == (B * 2, 8, I_H * I_W)
    # self-attention weights: (b*h, l_c, l_c)
    assert weights[2].shape == (B * 2, 8, 8)
    # rows sum to one
    np.testing.assert_allclose(weights[1].sum(-1), 1.0, rtol=1e-5)


def test_attention_module_order_tying():
    # depth 3, 2 modalities, 1 self block, tied: layer0 unique, layers 1-2 shared
    order = attention_module_order(3, 2, 1, True)
    # unique modules: 3 (layer0: 2 cross + 1 self) + 3 (tied group) = 6
    assert len(order) == 6
    # tied group entries report last_layer == 2 (weights of final invocation)
    assert order[3] == ("cross", 0, 1, 2)
    assert order[4] == ("cross", 1, 1, 2)
    assert order[5] == ("self", 0, 1, 2)


def test_per_sample_presence_functional(rng):
    """Per-sample static presence masks: one compiled program, per-row gating."""
    from healnet_tpu.models import HealNetModule

    module = HealNetModule(
        n_modalities=2,
        channel_dims=(T_D, I_C),
        num_spatial_axes=(1, 2),
        out_dims=4,
        **SMALL_HP,
    )
    tab = jnp.asarray(rng.normal(size=(B, T_C, T_D)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(B, I_H, I_W, I_C)).astype(np.float32))
    params = module.init(jax.random.PRNGKey(0), (tab, img))["params"]

    presence = jnp.ones((B, 2))
    presence = presence.at[0, 1].set(0.0)  # sample 0 misses modality 1
    out_masked = module.apply({"params": params}, (tab, img), presence=presence)
    out_full = module.apply({"params": params}, (tab, img))
    # sample 0 differs, others identical
    assert not np.allclose(out_masked[0], out_full[0])
    np.testing.assert_allclose(out_masked[1:], out_full[1:], rtol=1e-6)

    # zeroing the missing modality's data must not change the gated output
    img_zeroed = img.at[0].set(0.0)
    out_masked2 = module.apply({"params": params}, (tab, img_zeroed), presence=presence)
    np.testing.assert_allclose(out_masked[0], out_masked2[0], rtol=1e-6, atol=1e-6)


def test_wrapper_save_load_roundtrip(tmp_path, rng):
    tab = rng.normal(size=(B, T_C, T_D)).astype(np.float32)
    m = HealNet(n_modalities=1, channel_dims=[T_D], num_spatial_axes=[1], out_dims=4, **SMALL_HP)
    logits = np.asarray(m([tab]))
    m.save(tmp_path / "wrapper_ckpt")

    m2 = HealNet(n_modalities=1, channel_dims=[T_D], num_spatial_axes=[1], out_dims=4,
                 seed=99, **SMALL_HP)
    m2.load(tmp_path / "wrapper_ckpt")
    np.testing.assert_allclose(np.asarray(m2([tab])), logits, rtol=1e-6)


def test_wrapper_load_torch_state_dict(rng):
    import importlib.util, sys, torch

    spec = importlib.util.spec_from_file_location(
        "ref_hn_wrap", "/root/reference/healnet/models/healnet.py"
    )
    ref = importlib.util.module_from_spec(spec)
    sys.modules["ref_hn_wrap"] = ref
    spec.loader.exec_module(ref)
    torch.manual_seed(3)
    tm = ref.HealNet(
        n_modalities=1, channel_dims=[T_D], num_spatial_axes=[1], out_dims=4,
        depth=2, l_c=8, l_d=16, x_heads=2, l_heads=2,
        cross_dim_head=8, latent_dim_head=8,
    )
    tm.eval()
    tab = rng.normal(size=(B, T_C, T_D)).astype(np.float32)
    with torch.no_grad():
        ref_logits = tm([torch.tensor(tab)]).numpy()
    m = HealNet(n_modalities=1, channel_dims=[T_D], num_spatial_axes=[1], out_dims=4, **SMALL_HP)
    m.load_torch_state_dict(tm.state_dict())
    np.testing.assert_allclose(np.asarray(m([tab])), ref_logits, rtol=1e-4, atol=1e-5)


def test_single_mask_matching_no_modality_raises(rng):
    """A single-array mask whose width matches no modality's token count is
    an error, not a silent no-op (round-3 review)."""
    tab = rng.normal(size=(B, T_C, T_D)).astype(np.float32)
    m = HealNet(
        n_modalities=1, channel_dims=[T_D], num_spatial_axes=[1],
        out_dims=4, **SMALL_HP,
    )
    bad = np.ones((B, T_C + 3), bool)  # width matches nothing
    with pytest.raises(ValueError, match="per-modality"):
        m([tab], mask=bad)


def test_lazy_capture_replays_training_pass(rng):
    """get_attention_weights after a train=True forward returns the maps of
    THAT pass (same dropout rng), identical to what eager capture stored —
    reference semantics: 'weights of the last forward pass' (healnet.py:420)."""
    tab = rng.normal(size=(B, T_C, T_D)).astype(np.float32)
    kw = dict(
        n_modalities=1, channel_dims=[T_D], num_spatial_axes=[1],
        out_dims=4, attn_dropout=0.3, ff_dropout=0.4, seed=0, **SMALL_HP,
    )
    eager = HealNet(store_attention="eager", **kw)
    lazy = HealNet(store_attention="lazy", **kw)
    eager([tab], train=True)
    lazy([tab], train=True)
    w_eager = eager.get_attention_weights()
    w_lazy = lazy.get_attention_weights()
    assert len(w_eager) == len(w_lazy) > 0
    for a, b in zip(w_eager, w_lazy):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
