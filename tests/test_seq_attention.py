"""Sequence-parallel (KV-sharded) cross-attention tests on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from healnet_tpu.ops.attention import multihead_attention
from healnet_tpu.parallel import make_mesh
from healnet_tpu.parallel.seq_attention import sequence_parallel_attention


def _qkvm(rng, b=2, h=2, lq=8, lkv=64, d=16):
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, lkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, lkv, d)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(b, lkv)) > 0.3)
    return q, k, v, mask


def test_forward_parity_with_mask(rng):
    mesh = make_mesh(8)  # seq axis of size 2
    q, k, v, mask = _qkvm(rng)
    with mesh:
        out = sequence_parallel_attention(
            q, k, v, mesh, scale=16**-0.5, temperature=0.5, kv_mask=mask
        )
    ref, _ = multihead_attention(q, k, v, scale=16**-0.5, temperature=0.5, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_forward_parity_no_mask(rng):
    mesh = make_mesh(8)
    q, k, v, _ = _qkvm(rng, lkv=96)
    with mesh:
        out = sequence_parallel_attention(q, k, v, mesh, scale=0.3)
    ref, _ = multihead_attention(q, k, v, scale=0.3, temperature=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_gradient_parity(rng):
    mesh = make_mesh(8)
    q, k, v, mask = _qkvm(rng)

    def sp_loss(q, k, v):
        with mesh:
            out = sequence_parallel_attention(
                q, k, v, mesh, scale=16**-0.5, kv_mask=mask
            )
        return jnp.sum(jnp.sin(out))

    def ref_loss(q, k, v):
        out, _ = multihead_attention(
            q, k, v, scale=16**-0.5, temperature=0.5, kv_mask=mask
        )
        return jnp.sum(jnp.sin(out))

    g_sp = jax.grad(sp_loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_sp, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=f"grad {name}",
        )


def test_shard_fully_masked(rng):
    """One KV shard entirely masked must contribute nothing and stay finite."""
    mesh = make_mesh(8)
    q, k, v, _ = _qkvm(rng, lkv=64)
    mask = jnp.asarray(np.r_[np.ones((2, 32), bool), np.zeros((2, 32), bool)].reshape(2, 64))
    mask = jnp.concatenate([jnp.ones((2, 32), bool), jnp.zeros((2, 32), bool)], axis=1)
    with mesh:
        out = sequence_parallel_attention(q, k, v, mesh, scale=0.25, kv_mask=mask)
    ref, _ = multihead_attention(q, k, v, scale=0.25, temperature=0.5, kv_mask=mask)
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_jit_and_single_device_mesh(rng):
    """Degenerates cleanly on a 1-device mesh and under jit."""
    mesh = make_mesh(1)
    q, k, v, mask = _qkvm(rng, lkv=32)
    fn = jax.jit(
        lambda q, k, v: sequence_parallel_attention(
            q, k, v, mesh, scale=0.25, kv_mask=mask
        )
    )
    with mesh:
        out = fn(q, k, v)
    ref, _ = multihead_attention(q, k, v, scale=0.25, temperature=0.5, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
