"""Baseline model family tests, extending the reference suite
(`/root/reference/healnet/tests/test_baselines.py:30-109`) to every family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from healnet_tpu.models.baselines import (
    FCNN,
    MCAT,
    MILAttentionNet,
    MLPDecoder,
    MLPEncoder,
    MMPrognosis,
    MOTCAT,
    MultiModNModule,
    ClassDecoder,
    PatchEncoder,
    RegularizedFCNN,
    ResNetEncoder,
    SNN,
    sinkhorn_log,
)

B = 3
OMIC_D = 37
WSI_DIM = 24          # patch feature dim
N_PATCHES = 11
L_D = 16


@pytest.fixture
def mm_inputs(rng):
    omic = jnp.asarray(rng.normal(size=(B, 1, OMIC_D)).astype(np.float32))
    wsi = jnp.asarray(rng.normal(size=(B, WSI_DIM, N_PATCHES)).astype(np.float32))
    return omic, wsi


def _init_and_run(model, tensors, **kwargs):
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, tensors, **kwargs)
    out = model.apply(variables, tensors, **kwargs)
    return variables, out


def test_mcat_shapes(mm_inputs):
    model = MCAT(n_classes=4)
    _, logits = _init_and_run(model, list(mm_inputs))
    assert logits.shape == (B, 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_mcat_attention_exposed(mm_inputs):
    model = MCAT(n_classes=4)
    variables = model.init(jax.random.PRNGKey(0), list(mm_inputs))
    logits, attn = model.apply(variables, list(mm_inputs), return_attention=True)
    assert attn["coattn"].shape == (B, 1, N_PATCHES)
    np.testing.assert_allclose(np.asarray(attn["coattn"]).sum(-1), 1.0, rtol=1e-5)


def test_mcat_multi_signature_towers(mm_inputs):
    # reference mcat.py:64-71: one SNN tower per omic signature; embeddings
    # stack into the omic token axis and become co-attention queries
    omic, wsi = mm_inputs
    rng = np.random.default_rng(3)
    sigs = [
        rng.normal(size=(B, 40)).astype(np.float32),
        rng.normal(size=(B, 25)).astype(np.float32),
        rng.normal(size=(B, 60)).astype(np.float32),
    ]
    model = MCAT(n_classes=4)
    variables = model.init(jax.random.PRNGKey(0), [sigs, wsi])
    # one tower per signature in the param tree
    names = set(variables["params"].keys())
    assert {"sig_0_0", "sig_1_0", "sig_2_0"} <= names
    logits, attn = model.apply(variables, [sigs, wsi], return_attention=True)
    assert logits.shape == (B, 4)
    assert attn["coattn"].shape == (B, 3, N_PATCHES)
    # single-tensor behavior keeps the round-1 param names
    v1 = model.init(jax.random.PRNGKey(0), list(mm_inputs))
    assert "sig_0" in v1["params"]


def test_mcat_bilinear_fusion(mm_inputs):
    model = MCAT(n_classes=4, fusion="bilinear")
    _, logits = _init_and_run(model, list(mm_inputs))
    assert logits.shape == (B, 4)


def test_mil_attention_net(mm_inputs):
    _, wsi = mm_inputs
    model = MILAttentionNet(n_classes=4)
    _, logits = _init_and_run(model, [wsi])
    assert logits.shape == (B, 4)


def test_snn(mm_inputs):
    omic, _ = mm_inputs
    model = SNN(n_classes=4)
    _, logits = _init_and_run(model, [omic])
    assert logits.shape == (B, 4)


def test_snn_alpha_dropout_train_mode(mm_inputs):
    """AlphaDropout active in training must keep activations roughly normalised."""
    omic, _ = mm_inputs
    model = SNN(n_classes=4)
    variables = model.init(jax.random.PRNGKey(0), [omic])
    out1 = model.apply(
        variables, [omic], deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    out2 = model.apply(
        variables, [omic], deterministic=False, rngs={"dropout": jax.random.PRNGKey(3)}
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_sinkhorn_marginals(rng):
    cost = jnp.asarray(rng.uniform(size=(2, 5, 9)).astype(np.float32))
    plan = sinkhorn_log(cost, reg=0.05, n_iters=200)
    np.testing.assert_allclose(np.asarray(plan.sum(-1)), 1 / 5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(plan.sum(-2)), 1 / 9, atol=1e-3)


def test_motcat(mm_inputs):
    model = MOTCAT(n_classes=4, ot_iters=20)
    _, logits = _init_and_run(model, list(mm_inputs))
    assert logits.shape == (B, 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_motcat_unbalanced(mm_inputs):
    model = MOTCAT(n_classes=4, ot_iters=20, ot_tau=0.5)
    _, logits = _init_and_run(model, list(mm_inputs))
    assert np.isfinite(np.asarray(logits)).all()


def test_mm_prognosis(mm_inputs):
    model = MMPrognosis(output_dims=4)
    _, logits = _init_and_run(model, list(mm_inputs))
    assert logits.shape == (B, 4)


def test_mm_prognosis_presence_mask(mm_inputs):
    model = MMPrognosis(output_dims=4)
    variables = model.init(jax.random.PRNGKey(0), list(mm_inputs))
    presence = jnp.asarray([[1.0, 0.0]] * B)
    out = model.apply(variables, list(mm_inputs), presence=presence)
    assert np.isfinite(np.asarray(out)).all()


def test_fcnn_and_regularized(mm_inputs):
    omic, _ = mm_inputs
    model = FCNN(hidden_sizes=[32, 16], output_size=4)
    _, logits = _init_and_run(model, [omic])
    assert logits.shape == (B, 4)

    reg = RegularizedFCNN(output_dim=4)
    variables, probs = _init_and_run(reg, [omic])
    assert probs.shape == (B, 4)
    assert (np.asarray(probs) >= 0).all() and (np.asarray(probs) <= 1).all()
    assert float(reg.l1_regularization(variables["params"])) > 0
    assert float(reg.l2_regularization(variables["params"])) > 0


def test_multimodn_encoders(rng):
    state = jnp.asarray(rng.normal(size=(B, L_D)).astype(np.float32))
    omic = jnp.asarray(rng.normal(size=(B, OMIC_D)).astype(np.float32))
    patches = jnp.asarray(rng.normal(size=(B, N_PATCHES, WSI_DIM)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(B, 32, 32, 3)).astype(np.float32))

    enc = MLPEncoder(state_size=L_D, hidden_layers=(32, 16))
    v = enc.init(jax.random.PRNGKey(0), state, omic)
    assert enc.apply(v, state, omic).shape == (B, L_D)

    penc = PatchEncoder(state_size=L_D, hidden_layers=(32, 16))
    v = penc.init(jax.random.PRNGKey(0), state, patches)
    assert penc.apply(v, state, patches).shape == (B, L_D)

    renc = ResNetEncoder(state_size=L_D)
    v = renc.init(jax.random.PRNGKey(0), state, img)
    assert renc.apply(v, state, img).shape == (B, L_D)


def test_multimodn_decoders(rng):
    state = jnp.asarray(rng.normal(size=(B, L_D)).astype(np.float32))
    head = ClassDecoder(n_classes=4, activation=jax.nn.sigmoid)
    v = head.init(jax.random.PRNGKey(0), state)
    assert head.apply(v, state).shape == (B, 4)
    mlp_head = MLPDecoder(hidden_layers=(8,), n_classes=4)
    v = mlp_head.init(jax.random.PRNGKey(0), state)
    assert mlp_head.apply(v, state).shape == (B, 4)


def test_multimodn_module_loss_and_logits(rng):
    omic = jnp.asarray(rng.normal(size=(B, OMIC_D)).astype(np.float32))
    patches = jnp.asarray(rng.normal(size=(B, N_PATCHES, WSI_DIM)).astype(np.float32))
    model = MultiModNModule(
        state_size=L_D,
        encoders=[
            MLPEncoder(state_size=L_D, hidden_layers=(32, 16)),
            PatchEncoder(state_size=L_D, hidden_layers=(32, 16)),
        ],
        decoders=[ClassDecoder(n_classes=4, activation=jax.nn.sigmoid)],
    )
    target = jax.nn.one_hot(jnp.asarray([0, 1, 2]), 4)
    v = model.init(jax.random.PRNGKey(0), [omic, patches], targets=target)
    loss, logits = model.apply(v, [omic, patches], targets=target)
    assert logits.shape == (B, 4)
    assert np.isfinite(float(loss))
    # inference mode: logits only
    logits_only = model.apply(v, [omic, patches])
    assert logits_only.shape == (B, 4)


def test_multimodn_in_trainer(rng):
    """MultiModN trains through SurvivalTrainer with aux_loss."""
    from healnet_tpu.train import SurvivalTrainer

    n = 24
    data = {
        "tensors": (
            rng.normal(size=(n, OMIC_D)).astype(np.float32),
            rng.normal(size=(n, N_PATCHES, WSI_DIM)).astype(np.float32),
        ),
        "y_disc": rng.integers(0, 4, size=n).astype(np.int32),
        "censorship": rng.integers(0, 2, size=n).astype(np.float32),
        "event_time": rng.uniform(1, 100, size=n).astype(np.float32),
    }
    model = MultiModNModule(
        state_size=L_D,
        encoders=[
            MLPEncoder(state_size=L_D, hidden_layers=(16,)),
            PatchEncoder(state_size=L_D, hidden_layers=(16,)),
        ],
        decoders=[ClassDecoder(n_classes=4, activation=jax.nn.sigmoid)],
    )
    trainer = SurvivalTrainer(
        model, batch_size=8, epochs=1, early_stopping=False, gc_compat=1,
        aux_loss=True, n_bins=4,
    )
    res = trainer.fit(data, data, verbose=False)
    assert np.isfinite(res["train_loss"])


def test_baselines_in_trainer(mm_inputs, rng):
    """Every logits-style baseline trains one epoch through SurvivalTrainer."""
    from healnet_tpu.train import SurvivalTrainer

    n = 16
    data = {
        "tensors": (
            rng.normal(size=(n, 1, OMIC_D)).astype(np.float32),
            rng.normal(size=(n, WSI_DIM, N_PATCHES)).astype(np.float32),
        ),
        "y_disc": rng.integers(0, 4, size=n).astype(np.int32),
        "censorship": rng.integers(0, 2, size=n).astype(np.float32),
        "event_time": rng.uniform(1, 100, size=n).astype(np.float32),
    }
    for model in (MCAT(n_classes=4), MMPrognosis(output_dims=4), MOTCAT(n_classes=4, ot_iters=10)):
        trainer = SurvivalTrainer(
            model, batch_size=8, epochs=1, early_stopping=False, gc_compat=1
        )
        res = trainer.fit(data, data, verbose=False)
        assert np.isfinite(res["train_loss"]), type(model).__name__


def test_multimodn_bespoke_trainer_protocol():
    # the reference's own train/test/predict harness (multimodn.py:97-500):
    # per-(stage x decoder) loss/accuracy matrices incl. the stage-0 row,
    # binary confusion rates, history logging — here as one jitted step
    import numpy as np
    from healnet_tpu.models.baselines import (
        ClassDecoder, MLPEncoder, MultiModNModule,
    )
    from healnet_tpu.models.baselines.multimodn import MultiModNHistory
    from healnet_tpu.train import MultiModNTrainer

    rng = np.random.default_rng(0)
    n = 32
    tab = rng.normal(size=(n, 6)).astype(np.float32)
    img = rng.normal(size=(n, 4)).astype(np.float32)
    y = (tab[:, 0] + 0.3 * img[:, 0] > 0).astype(np.int32)  # learnable binary
    data = {
        "tensors": (tab, img),
        "y_disc": y,
        "censorship": np.zeros(n, np.float32),
        "event_time": np.ones(n, np.float32),
    }
    module = MultiModNModule(
        state_size=16,
        encoders=(MLPEncoder(16, (8,)), MLPEncoder(16, (8,))),
        decoders=(ClassDecoder(2),),
        err_penalty=1.0,
        state_change_penalty=0.5,
    )
    history = MultiModNHistory()
    trainer = MultiModNTrainer(module, n_classes=2, lr=5e-3, batch_size=8)
    train_m, val_m = trainer.fit(data, data, epochs=6, history=history)

    # matrices are (n_encoders + 1, n_decoders) with a stage-0 row
    assert train_m["loss"].shape == (3, 1)
    assert val_m["accuracy"].shape == (3, 1)
    # later stages see more modalities -> final-stage accuracy beats stage 0
    assert val_m["accuracy"][2, 0] > val_m["accuracy"][0, 0]
    assert val_m["accuracy"][2, 0] > 0.7
    # binary confusion rates defined and consistent
    ba = val_m["balanced_accuracy"]
    assert ba.shape == (3, 1) and np.isfinite(ba[2, 0])
    # predictions for every sample; history recorded train+val rows
    assert trainer.predict(data).shape == (n,)
    df = history.to_dataframe()
    assert {"train_loss", "val_loss"} <= set(df.columns) - {"epoch"} | set(df.columns)
    assert len(df) == 6 * 3 * 2  # epochs x stages x (train+val)


def test_baselines_honor_presence_masks(rng):
    """MCAT/MOTCAT/SNN/MIL apply presence by zero-imputing the absent
    modality, so the trainer's missing-modality ablation actually measures
    something (it silently no-opped before)."""
    import jax
    import jax.numpy as jnp

    from healnet_tpu.models.baselines import MCAT, MOTCAT, SNN

    b = 4
    omic = jnp.asarray(rng.normal(size=(b, 1, 40)).astype(np.float32))
    wsi = jnp.asarray(rng.normal(size=(b, 64, 12)).astype(np.float32))
    full = jnp.ones((b, 2), jnp.float32)
    no_wsi = full.at[:, 1].set(0.0)

    for cls in (MCAT, MOTCAT):
        model = cls(n_classes=4)
        params = model.init(jax.random.PRNGKey(0), (omic, wsi))["params"]
        out_full = model.apply({"params": params}, (omic, wsi), presence=full)
        out_miss = model.apply({"params": params}, (omic, wsi), presence=no_wsi)
        assert not np.allclose(np.asarray(out_full), np.asarray(out_miss)), cls

    snn = SNN(n_classes=4)
    params = snn.init(jax.random.PRNGKey(0), (omic,))["params"]
    out_full = snn.apply({"params": params}, (omic,), presence=jnp.ones((b, 1)))
    out_miss = snn.apply({"params": params}, (omic,), presence=jnp.zeros((b, 1)))
    assert not np.allclose(np.asarray(out_full), np.asarray(out_miss))


def test_bag_baselines_tokens_layout_equivalence(rng):
    """tokens_layout=True (the patch_attention / arena feed, (b, patches,
    dim)) must be EXACTLY the channels-layout model on the transposed input
    — same params, same logits. Without the flag the FC stacks would run
    over the patch axis."""
    import jax

    from healnet_tpu.models.baselines import MCAT, MILAttentionNet, MOTCAT
    from healnet_tpu.models.baselines.mm_prognosis import MMPrognosis

    b, patches, dim = 2, 12, 16
    omic = rng.normal(size=(b, 1, 40)).astype(np.float32)
    bag_tokens = rng.normal(size=(b, patches, dim)).astype(np.float32)
    bag_channels = np.swapaxes(bag_tokens, 1, 2)

    cases = [
        (MCAT(n_classes=4), MCAT(n_classes=4, tokens_layout=True), True),
        (MOTCAT(n_classes=4), MOTCAT(n_classes=4, tokens_layout=True), True),
        (
            MILAttentionNet(n_classes=4),
            MILAttentionNet(n_classes=4, tokens_layout=True),
            False,
        ),
        (
            MMPrognosis(output_dims=4),
            MMPrognosis(output_dims=4, tokens_layout=True),
            True,
        ),
    ]
    for mod_ch, mod_tok, with_omic in cases:
        t_ch = (omic, bag_channels) if with_omic else (bag_channels,)
        t_tok = (omic, bag_tokens) if with_omic else (bag_tokens,)
        params = mod_ch.init(jax.random.PRNGKey(0), t_ch)["params"]
        out_ch = mod_ch.apply({"params": params}, t_ch, deterministic=True)
        out_tok = mod_tok.apply({"params": params}, t_tok, deterministic=True)
        if isinstance(out_ch, tuple):
            out_ch, out_tok = out_ch[0], out_tok[0]
        np.testing.assert_allclose(
            np.asarray(out_tok), np.asarray(out_ch), rtol=1e-5, atol=1e-6,
            err_msg=type(mod_ch).__name__,
        )
