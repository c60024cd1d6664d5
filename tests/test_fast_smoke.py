"""Fast-tier smoke coverage for the modules whose full test files are
slow-marked (SPMD meshes, quantized arena, pipeline e2e, sequence
parallelism) — `pytest -m "not slow"` still imports and exercises every
package module through these (VERDICT r3 weak #1 / next #5).
"""

import numpy as np


def test_mesh_and_batch_sharding_smoke():
    """parallel/mesh.py surface on the 8-virtual-device CPU backend."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from healnet_tpu.parallel import make_mesh

    mesh = make_mesh(n_devices=8)
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    assert set(sizes) == {"data", "seq", "model"}
    assert int(np.prod(list(sizes.values()))) == 8
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    y = jax.jit(lambda a: a * 2.0)(xs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2.0)


def test_quantize_roundtrip_smoke():
    """ops/quantize.py per-token int8 contract on a tiny context."""
    import jax.numpy as jnp

    from healnet_tpu.ops.quantize import quantize_context, quantize_context_host

    rng = np.random.default_rng(0)
    ctx = np.asarray(rng.normal(size=(2, 16, 8)) * 3.0, np.float32)
    ctx[0, 3] = 0.0  # zero row (arena pad) must round-trip exactly
    q = quantize_context(jnp.asarray(ctx))
    assert np.asarray(q.data).dtype == np.int8 and q.scale.shape == (2, 16)
    deq = np.asarray(q.dequantize())
    err = np.max(np.abs(deq - ctx), axis=-1)
    bound = np.asarray(q.scale) * 0.5 + 1e-6
    assert (err <= bound).all()
    assert (deq[0, 3] == 0.0).all()
    # host twin agrees bit-for-bit (arena packing contract)
    qh, sh = quantize_context_host(ctx)
    np.testing.assert_array_equal(qh, np.asarray(q.data))
    np.testing.assert_array_equal(sh, np.asarray(q.scale))


def test_pipeline_model_factory_smoke():
    """train/pipeline.py VALID_MODELS + make_model shape inference, no
    training."""
    from healnet_tpu.train.pipeline import VALID_MODELS, Pipeline
    from healnet_tpu.utils.boxdict import Box

    assert {"healnet", "healnet_early", "fcnn", "mcat", "motcat",
            "mm_prognosis", "multimodn"} <= set(VALID_MODELS)
    config = Box({
        "model": "healnet",
        "dataset": "brca",
        "sources": ["omic", "slides"],
        "model_params.output_dims": 4,
        "model_params.depth": 1,
        "model_params.num_freq_bands": 2,
        "model_params.max_freq": 2.0,
        "model_params.num_latents": 4,
        "model_params.latent_dim": 8,
        "model_params.cross_dim_head": 4,
        "model_params.latent_dim_head": 4,
        "model_params.cross_heads": 1,
        "model_params.latent_heads": 1,
        "model_params.attn_dropout": 0.0,
        "model_params.ff_dropout": 0.0,
        "model_params.weight_tie_layers": False,
        "model_params.fourier_encode_data": True,
        "model_params.self_per_cross_attn": 0,
        "model_params.snn": True,
    })
    pipe = Pipeline.__new__(Pipeline)
    pipe.config = config
    pipe.sources = ["omic", "slides"]
    pipe.output_dims = 4
    batch = {
        "tensors": (
            np.zeros((2, 1, 20), np.float32),
            np.zeros((2, 16, 8), np.float32),
        ),
    }
    module = pipe.make_model(batch)
    assert module is not None and getattr(module, "out_dims", 4) == 4


def test_seq_attention_math_smoke():
    """parallel/seq_attention.py local-stats math (no mesh): one full-context
    shard's (m, l, o) combine equals the dense T=0.5 softmax."""
    import jax.numpy as jnp

    from healnet_tpu.parallel.seq_attention import _local_attention_stats

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 1, 4, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1, 12, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 1, 12, 8)), jnp.float32)
    m, l, o = _local_attention_stats(q, k, v, None, 8 ** -0.5, 0.5)
    out = np.asarray(o / l)
    s = jnp.einsum("bhid,bhjd->bhij", q, k) * (8 ** -0.5) / 0.5
    p = jnp.exp(s - jnp.max(s, -1, keepdims=True))
    p = p / jnp.sum(p, -1, keepdims=True)
    want = np.asarray(jnp.einsum("bhij,bhjd->bhid", p, v))
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)
