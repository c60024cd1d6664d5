"""Fused merged-KV projection kernel (ops/fused_project.py) vs the two-pass
XLA reference: values, parameter gradients, and input cotangents must agree,
and the model must produce identical logits whichever impl is dispatched."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from healnet_tpu.ops.fused_project import (
    _pallas_project,
    _xla_project,
    fused_kv_project,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _mats(rng, b=2, t=384, c=256, e=10, f=252, dtype=jnp.float32):
    dat = jnp.asarray(rng.normal(size=(b, t, c)), dtype)
    enc = jnp.asarray(rng.normal(size=(t, e)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(c + e, f)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32)
    return dat, enc, w, bias


def _pallas(dat, enc, w, bias, tile=128):
    return _pallas_project((1e-5, tile, True, None, False), dat, enc, w, bias)


def test_forward_parity_f32(rng):
    dat, enc, w, bias = _mats(rng)
    out_x = _xla_project(dat, enc, w, bias, 1e-5)
    out_p = _pallas(dat, enc, w, bias)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=2e-5, atol=2e-5)


def test_forward_parity_no_enc(rng):
    dat, _, w, bias = _mats(rng, e=0)
    out_x = _xla_project(dat, None, w, bias, 1e-5)
    out_p = _pallas(dat, None, w, bias)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=2e-5, atol=2e-5)


def test_forward_parity_bf16(rng):
    dat, enc, w, bias = _mats(rng, dtype=jnp.bfloat16)
    out_x = _xla_project(dat, enc, w, bias, 1e-5)
    out_p = _pallas(dat, enc, w, bias)
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_x, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_forward_parity_ragged_tokens(rng):
    """Token counts that are not a multiple of the tile: masked tail rows
    must not corrupt the output."""
    dat, enc, w, bias = _mats(rng, t=200)
    out_x = _xla_project(dat, enc, w, bias, 1e-5)
    out_p = _pallas(dat, enc, w, bias, tile=128)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=2e-5, atol=2e-5)


def test_param_grad_parity(rng):
    """d/d(w_all, b_all) through the custom VJP == XLA autodiff."""
    dat, enc, w, bias = _mats(rng)

    def loss_x(w, bias):
        out = _xla_project(dat, enc, w, bias, 1e-5)
        return jnp.sum(jnp.sin(out))

    def loss_p(w, bias):
        out = _pallas(dat, enc, w, bias)
        return jnp.sum(jnp.sin(out))

    gx = jax.grad(loss_x, argnums=(0, 1))(w, bias)
    gp = jax.grad(loss_p, argnums=(0, 1))(w, bias)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4)


def test_input_cotangent_parity(rng):
    """d/d(dat, enc) — the DCE-able branch — must still be correct for
    users differentiating through the context (e.g. saliency)."""
    dat, enc, w, bias = _mats(rng, t=128)

    def loss_x(dat, enc):
        return jnp.sum(jnp.cos(_xla_project(dat, enc, w, bias, 1e-5)))

    def loss_p(dat, enc):
        return jnp.sum(jnp.cos(_pallas(dat, enc, w, bias)))

    gx = jax.grad(loss_x, argnums=(0, 1))(dat, enc)
    gp = jax.grad(loss_p, argnums=(0, 1))(dat, enc)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-4)


def test_tile_invariance(rng):
    """The kernel schedule (tile size) must not change the result."""
    dat, enc, w, bias = _mats(rng, t=512)
    out_a = _pallas(dat, enc, w, bias, tile=128)
    out_b = _pallas(dat, enc, w, bias, tile=256)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6, atol=1e-6)


def test_auto_dispatch_off_tpu_is_xla(rng):
    """On CPU, auto must resolve to the XLA path (bit-identical)."""
    dat, enc, w, bias = _mats(rng)
    out_auto = fused_kv_project(dat, enc, w, bias, impl="auto")
    out_x = _xla_project(dat, enc, w, bias, 1e-5)
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_x))


def test_rejects_unknown_impl(rng):
    dat, enc, w, bias = _mats(rng, t=128)
    with pytest.raises(ValueError, match="unknown fused projection impl"):
        fused_kv_project(dat, enc, w, bias, impl="cuda")


def test_model_logits_identical_across_impls(rng):
    """HealNetModule logits with projection_impl='pallas' (interpret) match
    projection_impl='xla' to float tolerance."""
    from healnet_tpu.models import HealNetModule
    from healnet_tpu.ops import fused_project

    tab = jnp.asarray(rng.normal(size=(2, 1, 64)), jnp.float32)
    img = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)

    def build(impl):
        return HealNetModule(
            n_modalities=2, channel_dims=(64, 8), num_spatial_axes=(1, 2),
            out_dims=4, depth=2, l_c=8, l_d=32, x_heads=1, l_heads=2,
            cross_dim_head=16, latent_dim_head=16, self_per_cross_attn=0,
            projection_impl=impl,
        )

    params = build("xla").init(jax.random.PRNGKey(0), [tab, img])["params"]
    out_x = build("xla").apply({"params": params}, [tab, img])
    # pallas impl off-TPU routes through interpret mode automatically
    out_p = build("pallas").apply({"params": params}, [tab, img])
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=2e-5, atol=2e-5)


def test_split_columns_forward_and_vjp_exact(rng):
    """split_columns: forward == plain slicing; VJP (concat of disjoint
    column cotangents) bit-identical to XLA's pad-and-accumulate backward.

    The concat-VJP replaces the default slice backward, which re-touches
    the full merged-KV buffer once per fusion layer (~120 MB/layer on the
    kirp-5 step, scripts/probe_kirp_hlo.py)."""
    from healnet_tpu.ops.fused_project import split_columns

    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(size=(3, 16, 40)), dtype)
        widths = (8, 8, 8, 8, 8)

        def f_split(x):
            sls = split_columns(x, widths)
            return sum(
                jnp.sum(jnp.sin(s.astype(jnp.float32)) * (i + 1))
                for i, s in enumerate(sls)
            )

        def f_plain(x):
            return sum(
                jnp.sum(
                    jnp.sin(x[:, :, i * 8:(i + 1) * 8].astype(jnp.float32))
                    * (i + 1)
                )
                for i in range(5)
            )

        fwd_s = split_columns(x, widths)
        off = 0
        for w, s in zip(widths, fwd_s):
            assert jnp.array_equal(s, x[:, :, off:off + w])
            off += w
        g_s = jax.grad(f_split)(x)
        g_p = jax.grad(f_plain)(x)
        assert jnp.array_equal(g_s, g_p)


def test_split_columns_grad_jaxpr_has_no_pads(rng):
    """The point of the custom VJP: no pad ops in the backward trace."""
    import re

    from healnet_tpu.ops.fused_project import split_columns

    x = jnp.asarray(rng.normal(size=(2, 8, 24)), jnp.float32)

    def f(x):
        return sum(jnp.sum(s * (i + 1))
                   for i, s in enumerate(split_columns(x, (8, 8, 8))))

    s = str(jax.make_jaxpr(jax.grad(f))(x))
    assert not re.findall(r"\bpad\b", s), s
    assert "concatenate" in s


def test_keep_pad_forward_and_grads(rng):
    """keep_pad=True returns the lane-padded buffer (zero columns beyond F)
    and must not change parameter gradients: the healnet model slices layer
    groups straight out of the padded buffer."""
    import healnet_tpu.ops.fused_project as fp

    dat, enc, w, bias = _mats(rng, t=256, f=252)  # 252 -> pads to 256
    out = _pallas_project((1e-5, 128, True, None, True), dat, enc, w, bias)
    f = w.shape[1]
    assert out.shape[-1] == 256
    np.testing.assert_array_equal(np.asarray(out[..., f:]), 0.0)
    np.testing.assert_allclose(
        np.asarray(out[..., :f]), np.asarray(_pallas(dat, enc, w, bias)),
        rtol=1e-6, atol=1e-6,
    )

    def loss(w, bias, keep_pad):
        o = _pallas_project((1e-5, 128, True, None, keep_pad), dat, enc, w, bias)
        return jnp.sum(jnp.sin(o[..., :f]))

    g_plain = jax.grad(loss, argnums=(0, 1))(w, bias, False)
    g_pad = jax.grad(loss, argnums=(0, 1))(w, bias, True)
    for a, b in zip(g_plain, g_pad):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize("keep_pad", [False, True])
def test_bwd_kernel_grad_parity(rng, keep_pad):
    """The pallas backward kernel (_BWD_KERNEL=True; measured SLOWER on-chip
    and therefore default-off, see the module comment) must stay gradient-
    correct so the same-session A/B switch remains trustworthy."""
    import healnet_tpu.ops.fused_project as fp

    dat, enc, w, bias = _mats(rng)
    f = w.shape[1]

    def make_loss(keep):
        def loss(w, bias):
            o = _pallas_project((1e-5, 128, True, None, keep), dat, enc, w, bias)
            return jnp.sum(jnp.sin(o[..., :f]))
        return loss

    gx = jax.grad(make_loss(False), argnums=(0, 1))(w, bias)
    old = fp._BWD_KERNEL
    fp._BWD_KERNEL = True
    try:
        gk = jax.grad(make_loss(keep_pad), argnums=(0, 1))(w, bias)
    finally:
        fp._BWD_KERNEL = old
    for a, b in zip(gx, gk):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4
        )
