"""Int8 per-token quantized contexts (ops/quantize.py).

Covers the quantization math (error bound, zero-row exactness, host/device
twin agreement), quantized fused-KV-projection parity (pallas interpret vs
XLA, values + gradients), model-level neutrality, the quantized feature
arena in the training loop (replicated and mesh-sharded), and the pipeline
knob `data.quantize_arena`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from healnet_tpu.ops.fused_project import _xla_project, fused_kv_project
from healnet_tpu.ops.quantize import (
    QuantizedContext,
    quantize_context,
    quantize_context_host,
)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


# ------------------------------------------------------------- quantization


def test_roundtrip_error_bound(rng):
    x = rng.normal(size=(3, 64, 96)).astype(np.float32) * 4.0
    qc = quantize_context(jnp.asarray(x))
    deq = np.asarray(qc.dequantize())
    # symmetric absmax: per-element error is at most half a quantization step
    step = np.asarray(qc.scale)[..., None]
    assert np.all(np.abs(deq - x) <= 0.5 * step + 1e-7)


def test_zero_rows_quantize_exactly(rng):
    x = rng.normal(size=(2, 8, 16)).astype(np.float32)
    x[0, 3] = 0.0
    x[1, :] = 0.0
    qc = quantize_context(jnp.asarray(x))
    deq = np.asarray(qc.dequantize())
    assert np.all(deq[0, 3] == 0.0)
    assert np.all(deq[1] == 0.0)
    assert np.asarray(qc.scale)[1].max() == 0.0


def test_host_and_device_quantizers_agree(rng):
    x = rng.normal(size=(2, 32, 48)).astype(np.float32)
    q_host, s_host = quantize_context_host(x)
    qc = quantize_context(jnp.asarray(x))
    np.testing.assert_array_equal(q_host, np.asarray(qc.data))
    np.testing.assert_array_equal(s_host, np.asarray(qc.scale))


def test_rides_through_jit(rng):
    """QuantizedContext is a pytree: jit sees through it."""
    x = rng.normal(size=(2, 16, 32)).astype(np.float32)
    qc = quantize_context(jnp.asarray(x))

    @jax.jit
    def f(q):
        return q.dequantize().sum()

    np.testing.assert_allclose(
        np.asarray(f(qc)), np.asarray(qc.dequantize()).sum(), rtol=1e-5
    )


# ------------------------------------------------- fused projection parity


def _mats(rng, b=2, t=256, c=192, e=10, f=126):
    dat = rng.normal(size=(b, t, c)).astype(np.float32)
    enc = jnp.asarray(rng.normal(size=(t, e)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(c + e, f)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32)
    return dat, enc, w, bias


def test_quantized_projection_close_to_fp(rng):
    """Quantized XLA path ≈ full-precision path on the dequantized values:
    the only difference is int8 rounding of the context itself."""
    dat, enc, w, bias = _mats(rng)
    qc = quantize_context(jnp.asarray(dat))
    out_fp = _xla_project(qc.dequantize(jnp.float32), enc, w, bias, 1e-5)
    out_q = fused_kv_project(
        qc, enc, w, bias, impl="xla", out_dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(out_fp), rtol=2e-4, atol=2e-4
    )


def test_quantized_pallas_matches_xla(rng):
    """Same rounding contract in both impls -> tight agreement."""
    dat, enc, w, bias = _mats(rng)
    qc = quantize_context(jnp.asarray(dat))
    out_x = fused_kv_project(qc, enc, w, bias, impl="xla",
                             out_dtype=jnp.float32)
    out_p = fused_kv_project(qc, enc, w, bias, impl="pallas",
                             out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=2e-5, atol=2e-5
    )


def test_quantized_pallas_matches_xla_no_enc(rng):
    dat, _, w, bias = _mats(rng, e=0)
    qc = quantize_context(jnp.asarray(dat))
    out_x = fused_kv_project(qc, None, w, bias, impl="xla",
                             out_dtype=jnp.float32)
    out_p = fused_kv_project(qc, None, w, bias, impl="pallas",
                             out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=2e-5, atol=2e-5
    )


def test_quantized_pallas_bf16_out(rng):
    """bf16 compute dtype on a quantized context (the arena training case)."""
    dat, enc, w, bias = _mats(rng)
    qc = quantize_context(jnp.asarray(dat))
    out_x = fused_kv_project(qc, enc, w, bias, impl="xla",
                             out_dtype=jnp.bfloat16)
    out_p = fused_kv_project(qc, enc, w, bias, impl="pallas",
                             out_dtype=jnp.bfloat16, interpret=True)
    assert out_p.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_x, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_quantized_grad_parity(rng):
    """d/d(w, bias, scale) through the pallas custom VJP == XLA autodiff."""
    dat, enc, w, bias = _mats(rng, t=128)
    qc = quantize_context(jnp.asarray(dat))

    def loss(impl, interpret):
        def f(w, bias, scale):
            out = fused_kv_project(
                QuantizedContext(qc.data, scale), enc, w, bias,
                impl=impl, out_dtype=jnp.float32, interpret=interpret,
            )
            return jnp.sum(jnp.sin(out))

        return f

    gx = jax.grad(loss("xla", None), argnums=(0, 1, 2))(w, bias, qc.scale)
    gp = jax.grad(loss("pallas", True), argnums=(0, 1, 2))(w, bias, qc.scale)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-4
        )


# ------------------------------------------------------- model-level parity


def _healnet(projection_impl="xla", **kw):
    from healnet_tpu.models import HealNetModule

    return HealNetModule(
        n_modalities=2, channel_dims=(24, 32), num_spatial_axes=(1, 1),
        out_dims=4, depth=2, l_c=6, l_d=16, x_heads=1, l_heads=2,
        cross_dim_head=8, latent_dim_head=8, self_per_cross_attn=0,
        projection_impl=projection_impl, **kw,
    )


def test_model_quantized_context_close_to_fp(rng):
    """HealNetModule logits with an int8-quantized slide modality track the
    full-precision logits (quantization noise only)."""
    tab = jnp.asarray(rng.normal(size=(2, 1, 24)), jnp.float32)
    wsi = rng.normal(size=(2, 40, 32)).astype(np.float32)
    qc = quantize_context(jnp.asarray(wsi))

    model = _healnet()
    params = model.init(jax.random.PRNGKey(0), [tab, jnp.asarray(wsi)])["params"]
    out_fp = model.apply({"params": params}, [tab, qc.dequantize(jnp.float32)])
    out_q = model.apply({"params": params}, [tab, qc])
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(out_fp), rtol=5e-3, atol=5e-3
    )


def test_model_quantized_context_remat_path(rng):
    """remat dequantizes up front; logits must still track full precision."""
    tab = jnp.asarray(rng.normal(size=(2, 1, 24)), jnp.float32)
    wsi = rng.normal(size=(2, 40, 32)).astype(np.float32)
    qc = quantize_context(jnp.asarray(wsi))

    model = _healnet(remat=True)
    params = model.init(jax.random.PRNGKey(0), [tab, jnp.asarray(wsi)])["params"]
    out_fp = model.apply({"params": params}, [tab, qc.dequantize(jnp.float32)])
    out_q = model.apply({"params": params}, [tab, qc])
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(out_fp), rtol=5e-3, atol=5e-3
    )


def test_wrapper_quantized_context(rng):
    """The public HealNet wrapper accepts a QuantizedContext modality
    (README-quickstart flow with an int8 arena slide, incl. lazy init)."""
    from healnet_tpu import HealNet
    from healnet_tpu.ops import QuantizedContext, quantize_context_host

    tab = rng.normal(size=(2, 1, 24)).astype(np.float32)
    wsi = rng.normal(size=(2, 40, 32)).astype(np.float32)
    q, s = quantize_context_host(wsi)
    qc = QuantizedContext(jnp.asarray(q), jnp.asarray(s))

    model = HealNet(
        n_modalities=2, channel_dims=[24, 32], num_spatial_axes=[1, 1],
        out_dims=4, depth=2, l_c=6, l_d=16, x_heads=1, l_heads=2,
        cross_dim_head=8, latent_dim_head=8, self_per_cross_attn=0,
    )
    out_fp = np.asarray(model([tab, wsi]))          # lazy init on fp inputs
    out_q = np.asarray(model([tab, qc]))
    np.testing.assert_allclose(out_q, out_fp, rtol=5e-3, atol=5e-3)

    # quantized-first lazy init must work too
    model2 = HealNet(
        n_modalities=2, channel_dims=[24, 32], num_spatial_axes=[1, 1],
        out_dims=4, depth=2, l_c=6, l_d=16, x_heads=1, l_heads=2,
        cross_dim_head=8, latent_dim_head=8, self_per_cross_attn=0,
    )
    assert np.asarray(model2([tab, qc])).shape == (2, 4)


def test_model_quantized_pallas_matches_xla_impl(rng):
    """Impl dispatch must not change quantized logits beyond float noise."""
    tab = jnp.asarray(rng.normal(size=(2, 1, 24)), jnp.float32)
    wsi = rng.normal(size=(2, 40, 32)).astype(np.float32)
    qc = quantize_context(jnp.asarray(wsi))

    params = _healnet().init(jax.random.PRNGKey(0), [tab, jnp.asarray(wsi)])[
        "params"
    ]
    out_x = _healnet("xla").apply({"params": params}, [tab, qc])
    out_p = _healnet("pallas").apply({"params": params}, [tab, qc])
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=2e-5, atol=2e-5
    )


# ------------------------------------------------------------ trainer arena


def _synthetic_survival(n=24, tab_d=32, patches=10, patch_d=16, seed=0):
    rng = np.random.default_rng(seed)
    tab = rng.normal(size=(n, 1, tab_d)).astype(np.float32)
    wsi = rng.normal(size=(n, patches, patch_d)).astype(np.float32)
    signal = tab[:, 0, 0]
    event_time = np.exp(1.5 + signal + 0.1 * rng.normal(size=n)).astype(np.float32)
    censorship = (rng.uniform(size=n) < 0.3).astype(np.float32)
    qs = np.quantile(event_time, [0.25, 0.5, 0.75])
    y_disc = np.digitize(event_time, qs).astype(np.int32)
    return {
        "tensors": (tab, wsi),
        "y_disc": y_disc,
        "censorship": censorship,
        "event_time": event_time,
    }


def _arena_form(data, width, dim):
    n = data["y_disc"].shape[0]
    wsi = data["tensors"][1]
    return dict(
        tensors=(data["tensors"][0],),
        kv_masks=(None, np.ones((n, width), dtype=bool)),
        patch_offsets=(np.arange(n) * width).astype(np.int32),
        patch_lengths=np.full(n, width, dtype=np.int32),
        y_disc=data["y_disc"], censorship=data["censorship"],
        event_time=data["event_time"],
    ), np.concatenate([wsi.reshape(-1, dim), np.zeros((width, dim), np.float32)])


def _trainer_module():
    from healnet_tpu.models import HealNetModule

    return HealNetModule(
        n_modalities=2, channel_dims=(32, 16), num_spatial_axes=(1, 1),
        out_dims=4, depth=1, l_c=8, l_d=16, x_heads=1, l_heads=2,
        cross_dim_head=8, latent_dim_head=8, self_per_cross_attn=0,
    )


def test_trainer_quantized_arena_close_to_fp():
    """arena_quant=True trains to (near-)identical first-epoch losses: the
    only difference from the fp arena is int8 feature rounding."""
    from healnet_tpu.train import SurvivalTrainer

    width, dim = 10, 16
    data = _synthetic_survival(n=24, patches=width, patch_d=dim, seed=3)
    arena_data, arena = _arena_form(data, width, dim)

    def run(arena_quant):
        tr = SurvivalTrainer(
            _trainer_module(), batch_size=8, epochs=1, early_stopping=False,
            gc_compat=1, seed=0, feature_arena=arena,
            arena_quant=arena_quant,
        )
        assert tr.arena_quant is arena_quant
        return tr.fit(arena_data, arena_data, verbose=False)

    r_q = run(True)
    r_fp = run(False)
    np.testing.assert_allclose(
        r_q["train_loss"], r_fp["train_loss"], rtol=0.05
    )
    np.testing.assert_allclose(
        r_q["val_loss"], r_fp["val_loss"], rtol=0.05
    )
    assert np.isfinite(r_q["val_c_index"])


def test_trainer_quantized_arena_fused_epochs():
    """Quantized arena composes with the fused lax.scan epoch dispatch."""
    from healnet_tpu.train import SurvivalTrainer

    width, dim = 10, 16
    data = _synthetic_survival(n=24, patches=width, patch_d=dim, seed=3)
    arena_data, arena = _arena_form(data, width, dim)

    def run(fused):
        tr = SurvivalTrainer(
            _trainer_module(), batch_size=8, epochs=2, early_stopping=False,
            gc_compat=1, seed=0, feature_arena=arena, arena_quant=True,
            fused_epochs=fused,
        )
        return tr.fit(arena_data, arena_data, verbose=False)

    r_fused = run(True)
    r_step = run(False)
    np.testing.assert_allclose(
        r_fused["train_loss"], r_step["train_loss"], rtol=1e-5
    )
    np.testing.assert_allclose(
        r_fused["val_c_index"], r_step["val_c_index"], rtol=1e-6
    )


def test_trainer_quantized_sharded_arena_matches_replicated():
    """Quantized + row-sharded arena on the 8-dev mesh == quantized
    replicated arena (the int8 gather rides an i32 psum)."""
    from healnet_tpu.parallel import make_mesh
    from healnet_tpu.train import SurvivalTrainer

    mesh = make_mesh(8)
    width, dim = 8, 16
    data = _synthetic_survival(n=16, patches=width, patch_d=dim, seed=5)
    arena_data, arena = _arena_form(data, width, dim)

    def run(arena_sharded):
        tr = SurvivalTrainer(
            _trainer_module(), batch_size=8, epochs=1, early_stopping=False,
            gc_compat=1, seed=0, mesh=mesh, prefetch=0,
            feature_arena=(arena, arena_data["patch_offsets"],
                           arena_data["patch_lengths"]),
            arena_quant=True, arena_sharded=arena_sharded, arena_halo=width,
        )
        return tr.fit(arena_data, arena_data, verbose=False)

    r_sh = run(True)
    r_rep = run(False)
    np.testing.assert_allclose(
        r_sh["train_loss"], r_rep["train_loss"], rtol=1e-5
    )
    np.testing.assert_allclose(
        r_sh["val_c_index"], r_rep["val_c_index"], rtol=1e-6
    )


def test_trainer_all_round3_features_compose():
    """The full round-3 stack at once — int8 arena + row-sharded over the
    8-dev mesh + fused lax.scan epochs — trains to the same trajectory as
    the stepwise replicated-fp path (the combination no pairwise test
    covers)."""
    from healnet_tpu.parallel import make_mesh
    from healnet_tpu.train import SurvivalTrainer

    mesh = make_mesh(8)
    width, dim = 8, 16
    data = _synthetic_survival(n=16, patches=width, patch_d=dim, seed=11)
    arena_data, arena = _arena_form(data, width, dim)

    def run(**kw):
        tr = SurvivalTrainer(
            _trainer_module(), batch_size=8, epochs=2, early_stopping=False,
            gc_compat=1, seed=0, prefetch=0,
            feature_arena=(arena, arena_data["patch_offsets"],
                           arena_data["patch_lengths"]),
            arena_halo=width, **kw,
        )
        return tr.fit(arena_data, arena_data, verbose=False)

    r_all = run(mesh=mesh, arena_quant=True, arena_sharded=True,
                fused_epochs=True)
    r_base = run(arena_quant=True)  # single-device quantized stepwise
    np.testing.assert_allclose(
        r_all["train_loss"], r_base["train_loss"], rtol=1e-4
    )
    np.testing.assert_allclose(
        r_all["val_c_index"], r_base["val_c_index"], rtol=1e-6
    )
