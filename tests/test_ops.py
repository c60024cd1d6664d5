"""Unit tests for core numerics ops against the Torch reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from healnet_tpu.ops import (
    fourier_encode,
    fourier_channels,
    positional_encoding,
    gated_gelu,
    gated_selu,
    temperature_softmax,
    attention_scores,
    multihead_attention,
    split_heads,
)


def _torch_fourier_encode(x, max_freq, num_bands):
    # reference `fourier_encode` (/root/reference/healnet/models/healnet.py:292-302)
    import math

    x = x.unsqueeze(-1)
    orig_x = x
    scales = torch.linspace(1.0, max_freq / 2, num_bands, dtype=x.dtype)
    scales = scales[(*((None,) * (len(x.shape) - 1)), Ellipsis)]
    x = x * scales * math.pi
    x = torch.cat([x.sin(), x.cos()], dim=-1)
    x = torch.cat((x, orig_x), dim=-1)
    return x


def test_fourier_encode_matches_reference(rng):
    x = rng.uniform(-1, 1, size=(5, 7)).astype(np.float32)
    ours = np.asarray(fourier_encode(jnp.asarray(x), max_freq=10.0, num_bands=4))
    theirs = _torch_fourier_encode(torch.tensor(x), 10.0, 4).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)
    assert ours.shape == (5, 7, 9)


def test_fourier_channels():
    # axis * (2 * bands + 1) (`healnet.py:137`)
    assert fourier_channels(2, 2) == 10
    assert fourier_channels(3, 4) == 27


def test_positional_encoding_grid(rng):
    enc = positional_encoding((4, 6), max_freq=10.0, num_bands=2)
    assert enc.shape == (4, 6, 10)
    # reference builds meshgrid of linspace(-1, 1) per axis (`healnet.py:211-213`)
    axis0 = torch.linspace(-1, 1, 4)
    axis1 = torch.linspace(-1, 1, 6)
    pos = torch.stack(torch.meshgrid(axis0, axis1, indexing="ij"), dim=-1)
    ref = _torch_fourier_encode(pos, 10.0, 2).reshape(4, 6, -1).numpy()
    np.testing.assert_allclose(np.asarray(enc), ref, rtol=1e-6, atol=1e-6)


def test_gated_activations(rng):
    x = rng.normal(size=(3, 8)).astype(np.float32)
    xt = torch.tensor(x)
    a, gates = xt.chunk(2, dim=-1)
    np.testing.assert_allclose(
        np.asarray(gated_gelu(jnp.asarray(x))),
        (a * F.gelu(gates)).numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(gated_selu(jnp.asarray(x))),
        (a * F.selu(gates)).numpy(),
        rtol=1e-5,
        atol=1e-6,
    )


def test_temperature_softmax(rng):
    x = rng.normal(size=(4, 9)).astype(np.float32)
    ours = np.asarray(temperature_softmax(jnp.asarray(x), temperature=0.5))
    theirs = F.softmax(torch.tensor(x) / 0.5, dim=-1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


def test_attention_mask_and_temperature(rng):
    b, h, lq, lkv, d = 2, 3, 4, 11, 8
    q = rng.normal(size=(b, h, lq, d)).astype(np.float32)
    k = rng.normal(size=(b, h, lkv, d)).astype(np.float32)
    v = rng.normal(size=(b, h, lkv, d)).astype(np.float32)
    mask = rng.uniform(size=(b, lkv)) > 0.3
    scale = d**-0.5

    out, w = multihead_attention(
        jnp.asarray(q),
        jnp.asarray(k),
        jnp.asarray(v),
        scale=scale,
        temperature=0.5,
        kv_mask=jnp.asarray(mask),
        return_weights=True,
    )
    # reference math (`healnet.py:409-424`)
    sim = torch.einsum("bhid,bhjd->bhij", torch.tensor(q), torch.tensor(k)) * scale
    mt = torch.tensor(mask)[:, None, None, :]
    sim = sim.masked_fill(~mt, -torch.finfo(sim.dtype).max / 2)
    attn = F.softmax(sim / 0.5, dim=-1)
    ref = torch.einsum("bhij,bhjd->bhid", attn, torch.tensor(v))
    ref = ref.permute(0, 2, 1, 3).reshape(b, lq, h * d).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), attn.numpy(), rtol=1e-5, atol=1e-7)
    # masked keys receive ~zero attention
    assert np.asarray(w)[~np.broadcast_to(mask[:, None, None, :], w.shape)].max() < 1e-12


def test_fully_masked_row_is_finite(rng):
    """All-masked contexts must not produce NaNs (missing-modality gating)."""
    b, h, lq, lkv, d = 1, 1, 2, 5, 4
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, lkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, lkv, d)).astype(np.float32))
    mask = jnp.zeros((b, lkv), dtype=bool)
    out, _ = multihead_attention(q, k, v, scale=0.5, kv_mask=mask)
    assert bool(jnp.isfinite(out).all())


def test_split_heads(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 12)).astype(np.float32))
    y = split_heads(x, heads=3)
    assert y.shape == (2, 3, 5, 4)
    np.testing.assert_allclose(np.asarray(y[0, 1, 2]), np.asarray(x[0, 2, 4:8]))


def test_masked_rows_finite_at_low_temperature(rng):
    """Temperatures < 0.5 used to overflow the mask fill to -inf and turn
    fully-masked rows into NaN (fill is now applied after the temperature
    division); empty bags must still produce exactly zero."""
    from healnet_tpu.ops.attention import multihead_attention

    b, h, lq, lkv, d = 2, 2, 3, 5, 4
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, lkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, lkv, d)).astype(np.float32))
    kv_mask = np.ones((b, lkv), bool)
    kv_mask[1, :] = False  # sample 1: empty bag
    for temperature in (0.25, 0.1, 0.5, 1.0):
        out, _ = multihead_attention(
            q, k, v, scale=d**-0.5, temperature=temperature,
            kv_mask=jnp.asarray(kv_mask),
        )
        assert np.isfinite(np.asarray(out)).all(), temperature
        np.testing.assert_array_equal(np.asarray(out)[1], 0.0)


def test_mask_family_switch(rng):
    """mask_family('threefry') swaps the attention-dropout mask family to
    jax.random.bernoulli (the torch-family draws) on the dense XLA path —
    the parity-falsification switch. Must change the realised mask, keep
    inverted-dropout scaling, and restore cleanly."""
    import jax

    from healnet_tpu.ops import hash_dropout
    from healnet_tpu.ops.attention import multihead_attention

    b, h, lq, lkv, d = 2, 2, 8, 32, 4
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, lkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, lkv, d)), jnp.float32)
    key = jax.random.PRNGKey(3)
    rate = 0.4

    def run():
        out, _ = multihead_attention(
            q, k, v, scale=0.5, dropout_rng=key, dropout_rate=rate
        )
        return np.asarray(out)

    assert hash_dropout.mask_family() == "hash"
    out_hash = run()
    try:
        hash_dropout.mask_family("threefry")
        out_tf = run()
        out_tf2 = run()
    finally:
        hash_dropout.mask_family("hash")
    # different family -> different realised masks, same determinism
    assert not np.allclose(out_hash, out_tf)
    np.testing.assert_array_equal(out_tf, out_tf2)
    # both families keep the inverted-dropout expectation: averaging over
    # many seeds must approach the no-dropout output
    out_ref, _ = multihead_attention(q, k, v, scale=0.5)
    for family in ("hash", "threefry"):
        hash_dropout.mask_family(family)
        try:
            acc = np.zeros_like(out_hash)
            n = 48
            for i in range(n):
                o, _ = multihead_attention(
                    q, k, v, scale=0.5,
                    dropout_rng=jax.random.PRNGKey(100 + i), dropout_rate=rate,
                )
                acc += np.asarray(o)
        finally:
            hash_dropout.mask_family("hash")
        err = np.max(np.abs(acc / n - np.asarray(out_ref)))
        assert err < 0.35, (family, err)
    with pytest.raises(AssertionError):
        hash_dropout.mask_family("philox")
