"""Flash cross-attention kernel parity vs the XLA reference path.

Runs in Pallas interpret mode on CPU; the identical kernel compiles on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from healnet_tpu.ops.attention import multihead_attention
from healnet_tpu.ops.flash_attention import flash_cross_attention


def _qkv(rng, b=2, h=2, lq=17, lkv=300, d=63):
    q = rng.normal(size=(b, h, lq, d)).astype(np.float32)
    k = rng.normal(size=(b, h, lkv, d)).astype(np.float32)
    v = rng.normal(size=(b, h, lkv, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("lq,lkv,d", [(17, 300, 63), (16, 1024, 128), (8, 100, 20)])
def test_forward_parity(rng, lq, lkv, d):
    q, k, v = _qkv(rng, lq=lq, lkv=lkv, d=d)
    scale = d**-0.5
    ref, _ = multihead_attention(q, k, v, scale=scale, temperature=0.5)
    out = flash_cross_attention(q, k, v, scale=scale, temperature=0.5, kv_chunk=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_forward_parity_masked(rng):
    q, k, v = _qkv(rng, lkv=257)
    mask = jnp.asarray(rng.uniform(size=(2, 257)) > 0.4)
    scale = 63**-0.5
    ref, _ = multihead_attention(q, k, v, scale=scale, temperature=0.5, kv_mask=mask)
    out = flash_cross_attention(
        q, k, v, scale=scale, temperature=0.5, kv_mask=mask, kv_chunk=128
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fully_masked_rows_finite(rng):
    q, k, v = _qkv(rng, b=1, h=1, lkv=256)
    mask = jnp.zeros((1, 256), bool)
    out = flash_cross_attention(q, k, v, scale=0.2, kv_mask=mask, kv_chunk=128)
    assert bool(jnp.isfinite(out).all())


def test_fully_masked_rows_agree_across_impls(rng):
    # ADVICE r1: both paths must output ZERO for an empty patch bag so that
    # attention_impl='auto' cannot silently change model outputs
    q, k, v = _qkv(rng, b=2, h=2, lkv=256)
    mask = jnp.zeros((2, 256), bool)
    ref, w = multihead_attention(
        q, k, v, scale=0.2, temperature=0.5, kv_mask=mask, return_weights=True
    )
    out = flash_cross_attention(
        q, k, v, scale=0.2, temperature=0.5, kv_mask=mask, kv_chunk=128
    )
    np.testing.assert_allclose(np.asarray(ref), 0.0)
    np.testing.assert_allclose(np.asarray(out), 0.0)
    np.testing.assert_allclose(np.asarray(w), 0.0)


def test_gradient_parity(rng):
    q, k, v = _qkv(rng, b=1, h=2, lq=16, lkv=320, d=64)
    mask = jnp.asarray(rng.uniform(size=(1, 320)) > 0.3)
    scale = 64**-0.5

    def ref_loss(q, k, v):
        out, _ = multihead_attention(q, k, v, scale=scale, temperature=0.5, kv_mask=mask)
        return jnp.sum(out * jnp.cos(out))

    def flash_loss(q, k, v):
        out = flash_cross_attention(
            q, k, v, scale=scale, temperature=0.5, kv_mask=mask, kv_chunk=128
        )
        return jnp.sum(out * jnp.cos(out))

    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    flash_grads = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    for g_ref, g_flash, name in zip(ref_grads, flash_grads, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g_flash), np.asarray(g_ref), rtol=5e-4, atol=5e-5,
            err_msg=f"grad mismatch for {name}",
        )


def test_bf16_inputs(rng):
    q, k, v = _qkv(rng, lq=16, lkv=256, d=128)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    out = flash_cross_attention(qb, kb, vb, scale=128**-0.5, kv_chunk=128)
    ref, _ = multihead_attention(q, k, v, scale=128**-0.5, temperature=0.5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_module_flash_matches_xla(rng):
    """Attention module with attention_impl='flash' == 'xla' end to end."""
    from healnet_tpu.models.layers import Attention

    x = jnp.asarray(rng.normal(size=(2, 17, 32)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 300, 48)).astype(np.float32))
    kwargs = dict(query_dim=32, context_dim=48, heads=2, dim_head=24)
    attn_x = Attention(attention_impl="xla", **kwargs)
    params = attn_x.init(jax.random.PRNGKey(0), x, context=ctx)
    out_x, _ = attn_x.apply(params, x, context=ctx)
    attn_f = Attention(attention_impl="flash", **kwargs)
    out_f, _ = attn_f.apply(params, x, context=ctx)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), rtol=2e-5, atol=2e-5)
