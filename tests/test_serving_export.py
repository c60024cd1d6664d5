"""Deployment-artifact tests: jax.export roundtrip of the serving layer.

The exported StableHLO artifact must reproduce the live Predictor exactly
(same programs, same params) while being loadable WITHOUT the model class
— only the manifest + program bytes + params.npz.
"""

import json

import jax
import numpy as np
import pytest

from healnet_tpu.models import HealNetModule
from healnet_tpu.serving import Predictor
from healnet_tpu.serving_export import ExportedPredictor


@pytest.fixture
def module_and_params(rng):
    module = HealNetModule(
        n_modalities=2, channel_dims=(12, 6), num_spatial_axes=(1, 1),
        out_dims=4, depth=1, l_c=4, l_d=8, x_heads=1, l_heads=1,
        cross_dim_head=4, latent_dim_head=4, self_per_cross_attn=0,
    )
    tensors = (
        np.zeros((2, 1, 12), np.float32),
        np.zeros((2, 5, 6), np.float32),
    )
    params = module.init(jax.random.PRNGKey(0), tensors)["params"]
    return module, params


def test_export_roundtrip_dense(module_and_params, tmp_path, rng):
    module, params = module_and_params
    live = Predictor(module, params, batch_size=4)
    live.export(tmp_path / "art", example_shapes=[(1, 12), (5, 6)])

    served = ExportedPredictor(tmp_path / "art")
    n = 7  # exercises padding + splitting
    omic = rng.normal(size=(n, 1, 12)).astype(np.float32)
    wsi = rng.normal(size=(n, 5, 6)).astype(np.float32)
    got = served([omic, wsi])
    want = live([omic, wsi])
    for k in ("logits", "hazards", "survival", "risk"):
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-6)

    # manifest records enough to validate a deployment host
    manifest = json.loads((tmp_path / "art" / "manifest.json").read_text())
    assert manifest["batch_size"] == 4
    assert manifest["out_dims"] == 4
    assert manifest["jax_version"] == jax.__version__


def test_export_missing_modality_and_masks(module_and_params, tmp_path, rng):
    module, params = module_and_params
    live = Predictor(module, params, batch_size=4)
    live.export(tmp_path / "art", example_shapes=[(1, 12), (5, 6)])
    served = ExportedPredictor(tmp_path / "art")

    omic = rng.normal(size=(5, 1, 12)).astype(np.float32)
    wsi = rng.normal(size=(5, 5, 6)).astype(np.float32)

    # missing modality (None) -> zero-fill + presence column, like the live path
    got = served([omic, None])
    want = live([omic, None])
    np.testing.assert_allclose(got["logits"], want["logits"], rtol=1e-6, atol=1e-6)

    # explicit KV masks change outputs and match the live masked program
    mask = np.ones((5, 5), bool)
    mask[:, 3:] = False
    got = served([omic, wsi], kv_masks=[None, mask])
    want = live([omic, wsi], kv_masks=[None, mask])
    np.testing.assert_allclose(got["logits"], want["logits"], rtol=1e-6, atol=1e-6)
    unmasked = served([omic, wsi])
    assert not np.allclose(got["logits"], unmasked["logits"])

    # empty request: well-shaped zero outputs
    empty = served([np.zeros((0, 1, 12), np.float32), None])
    assert empty["logits"].shape == (0, 4) and empty["risk"].shape == (0,)


def test_export_ragged_widths(module_and_params, tmp_path, rng):
    module, params = module_and_params
    boundaries = [8, 16]
    live = Predictor(
        module, params, batch_size=4, bucket_boundaries=boundaries
    )
    live.export(
        tmp_path / "art", example_shapes=[(1, 12), (5, 6)], widths=boundaries
    )
    served = ExportedPredictor(tmp_path / "art")

    n = 6
    omic = rng.normal(size=(n, 1, 12)).astype(np.float32)
    bags = [
        rng.normal(size=(ln, 6)).astype(np.float32)
        for ln in (3, 8, 11, 16, 2, 13)
    ]
    bags[4] = None  # missing bag rides the same path
    got = served.predict_ragged([omic, bags])
    want = live.predict_ragged([omic, bags])
    for k in ("logits", "risk"):
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-6)

    # widths are mandatory for ragged serving
    live.export(tmp_path / "dense_only", example_shapes=[(1, 12), (5, 6)])
    with pytest.raises(ValueError, match="widths"):
        ExportedPredictor(tmp_path / "dense_only").predict_ragged([omic, bags])


def test_export_bf16_params_roundtrip(module_and_params, tmp_path, rng):
    import jax.numpy as jnp

    module, params = module_and_params
    bf16_params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), params
    )
    live = Predictor(
        module, bf16_params, batch_size=4, compute_dtype=jnp.bfloat16
    )
    live.export(tmp_path / "art", example_shapes=[(1, 12), (5, 6)])
    served = ExportedPredictor(tmp_path / "art")
    # bf16 -> f32 -> bf16 is exact; params must be bit-identical
    for path, leaf in jax.tree_util.tree_flatten_with_path(served.params)[0]:
        assert leaf.dtype == jnp.bfloat16
    omic = rng.normal(size=(4, 1, 12)).astype(np.float32)
    wsi = rng.normal(size=(4, 5, 6)).astype(np.float32)
    np.testing.assert_allclose(
        served([omic, wsi])["logits"],
        live([omic, wsi])["logits"],
        rtol=1e-6, atol=1e-6,
    )


def test_export_ragged_mask_free_bag_module(tmp_path, rng):
    """Bag baselines (MCAT/MultiModN convention: __call__ takes no kv_masks)
    must serve ragged requests from the ARTIFACT too: the exported program
    was traced with kv_masks=None, so predict_ragged must drop the mask list
    exactly as the live Predictor does — previously it passed a tuple and
    Exported.call raised a pytree-structure ValueError."""
    import flax.linen as nn
    import jax.numpy as jnp

    class BagPool(nn.Module):
        out_dims: int = 4

        @nn.compact
        def __call__(self, tensors, presence=None, deterministic=True):
            omic = tensors[0].reshape((tensors[0].shape[0], -1))
            bag = jnp.mean(tensors[1], axis=1)  # pools zero-padded tokens
            return nn.Dense(self.out_dims)(jnp.concatenate([omic, bag], -1))

    module = BagPool()
    dim = 6
    params = module.init(
        jax.random.PRNGKey(0),
        (np.zeros((2, 1, 12), np.float32), np.zeros((2, 8, dim), np.float32)),
    )["params"]
    boundaries = [8, 16]
    live = Predictor(
        module, params, batch_size=4, bucket_boundaries=boundaries,
        mod_shapes={0: (1, 12)},
    )
    live.export(
        tmp_path / "art", example_shapes=[(1, 12), (8, dim)], widths=boundaries
    )
    served = ExportedPredictor(tmp_path / "art")
    assert served.manifest["uses_masks"] is False

    n = 5
    omic = rng.normal(size=(n, 1, 12)).astype(np.float32)
    bags = [
        rng.normal(size=(ln, dim)).astype(np.float32)
        for ln in (3, 8, 5, 12, 2)
    ]
    got = served.predict_ragged([omic, bags])
    want = live.predict_ragged([omic, bags])
    for k in ("logits", "risk"):
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-6)

    # the dense artifact path serves mask-free modules too
    wsi = rng.normal(size=(n, 8, dim)).astype(np.float32)
    np.testing.assert_allclose(
        served([omic, wsi])["logits"], live([omic, wsi])["logits"],
        rtol=1e-5, atol=1e-6,
    )


def test_export_version_pins_enforced(module_and_params, tmp_path, rng):
    """The manifest's jax_version/platforms pins are enforced at load:
    warn by default, raise under strict_versions (export disables the
    tpu_custom_call stability check, so the pin IS the safety check)."""
    import warnings

    module, params = module_and_params
    Predictor(module, params, batch_size=4).export(
        tmp_path / "art", example_shapes=[(1, 12), (5, 6)]
    )
    manifest_path = tmp_path / "art" / "manifest.json"
    manifest = json.loads(manifest_path.read_text())

    # matching host: clean load
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ExportedPredictor(tmp_path / "art")

    manifest["jax_version"] = "0.0.1"
    manifest_path.write_text(json.dumps(manifest))
    with pytest.warns(RuntimeWarning, match="0.0.1"):
        ExportedPredictor(tmp_path / "art")
    with pytest.raises(ValueError, match="0.0.1"):
        ExportedPredictor(tmp_path / "art", strict_versions=True)

    manifest["jax_version"] = jax.__version__
    manifest["platforms"] = ["nonexistent_backend"]
    manifest_path.write_text(json.dumps(manifest))
    with pytest.raises(ValueError, match="nonexistent_backend"):
        ExportedPredictor(tmp_path / "art", strict_versions=True)


def test_export_rejects_non_roundtrippable_params(module_and_params, tmp_path):
    """Pytrees that can't survive the artifact's flatten/unflatten (tuple
    nodes, '::' in a key) fail LOUDLY at export time, not as an opaque
    structure mismatch at serve time."""
    module, params = module_and_params
    live = Predictor(module, params, batch_size=4)
    live.params = {"pair": (np.zeros(2), np.zeros(3))}  # tuple node
    with pytest.raises(ValueError, match="round-trip"):
        live.export(tmp_path / "bad", example_shapes=[(1, 12), (5, 6)])

    live.params = {"a::b": np.zeros(2)}  # separator collision
    with pytest.raises(ValueError, match="round-trip"):
        live.export(tmp_path / "bad2", example_shapes=[(1, 12), (5, 6)])


def test_exported_artifact_needs_no_model_code(module_and_params, tmp_path, rng):
    """The artifact serves through a module-free loader: only files on disk."""
    module, params = module_and_params
    Predictor(module, params, batch_size=4).export(
        tmp_path / "art", example_shapes=[(1, 12), (5, 6)]
    )
    files = {p.name for p in (tmp_path / "art").iterdir()}
    assert files == {"manifest.json", "params.npz", "predict.bin"}
    served = ExportedPredictor(tmp_path / "art")
    assert not hasattr(served, "module")
    out = served(
        [rng.normal(size=(2, 1, 12)).astype(np.float32),
         rng.normal(size=(2, 5, 6)).astype(np.float32)]
    )
    assert out["logits"].shape == (2, 4)


def test_exported_warmup_compiles_every_program(module_and_params, tmp_path, rng):
    """ExportedPredictor.warmup deserializes + executes the dense program
    and every bucket-width program; live traffic afterwards loads nothing."""
    module, params = module_and_params
    boundaries = [8, 16]
    live = Predictor(module, params, batch_size=4, bucket_boundaries=boundaries)
    live.export(
        tmp_path / "art", example_shapes=[(1, 12), (5, 6)], widths=boundaries
    )
    served = ExportedPredictor(tmp_path / "art")
    stats = served.warmup()
    assert stats["programs"] == 3  # dense + w8 + w16
    assert set(served._fns) == {"predict", "predict_w8", "predict_w16"}
    loaded = dict(served._fns)
    omic = rng.normal(size=(3, 1, 12)).astype(np.float32)
    bags = [rng.normal(size=(ln, 6)).astype(np.float32) for ln in (3, 9, 16)]
    out = served.predict_ragged([omic, bags])
    assert out["risk"].shape == (3,)
    assert served._fns == loaded  # nothing new deserialized by live traffic
