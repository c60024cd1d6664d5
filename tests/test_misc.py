"""Checkpoint-resume, manifests, profiling, config-system tests."""

import json

import numpy as np
import pandas as pd
import pytest

from healnet_tpu.etl.manifests import filter_manifest, read_manifest, write_manifest
from healnet_tpu.models import HealNetModule
from healnet_tpu.train import SurvivalTrainer
from healnet_tpu.utils import Config, flatten_config, unflatten_config, Box
from healnet_tpu.utils.profiling import StepTimer


def _data(n, seed):
    rng = np.random.default_rng(seed)
    return {
        "tensors": (rng.normal(size=(n, 1, 16)).astype(np.float32),),
        "y_disc": rng.integers(0, 4, n).astype(np.int32),
        "censorship": rng.integers(0, 2, n).astype(np.float32),
        "event_time": rng.uniform(1, 100, n).astype(np.float32),
    }


def _module():
    return HealNetModule(
        n_modalities=1, channel_dims=(16,), num_spatial_axes=(1,), out_dims=4,
        depth=1, l_c=4, l_d=8, x_heads=1, l_heads=1,
        cross_dim_head=4, latent_dim_head=4, self_per_cross_attn=0,
    )


def test_trainer_checkpoint_resume(tmp_path):
    train, val = _data(32, 0), _data(16, 1)
    ckpt_dir = tmp_path / "ckpt"

    t1 = SurvivalTrainer(
        _module(), batch_size=8, epochs=3, early_stopping=False, gc_compat=1,
        checkpoint_dir=ckpt_dir, seed=0,
    )
    res1 = t1.fit(train, val, verbose=False)
    assert len(res1["history"]) == 3

    # resume continues from epoch 4 and runs only epochs 4-5
    t2 = SurvivalTrainer(
        _module(), batch_size=8, epochs=5, early_stopping=False, gc_compat=1,
        checkpoint_dir=ckpt_dir, resume=True, seed=0,
    )
    res2 = t2.fit(train, val, verbose=False)
    assert [h["epoch"] for h in res2["history"]] == [4, 5]
    # loss continues improving from the restored state
    assert res2["history"][-1]["train_loss"] < res1["history"][0]["train_loss"]


def test_manifest_roundtrip(tmp_path):
    df = pd.DataFrame(
        {
            "id": ["a", "b", "c"],
            "filename": ["x1.svs", "x2.svs", "other.txt"],
            "md5": ["m1", "m2", "m3"],
        }
    )
    path = tmp_path / "manifest.txt"
    write_manifest(df, path)
    loaded = read_manifest(path)
    assert list(loaded.columns) == ["id", "filename", "md5"]
    assert len(filter_manifest(loaded, contains=".svs")) == 2
    assert len(filter_manifest(loaded, keep_filenames=["x1.svs"])) == 1


def test_step_timer():
    import time

    timer = StepTimer(samples_per_step=4)
    for _ in range(3):
        timer.start()
        time.sleep(0.01)
        timer.stop(fence=np.asarray([1.0]))
    s = timer.summary()
    assert s["steps"] == 2  # warmup skipped
    assert s["samples_per_sec"] > 0


def test_config_include_and_user_overlay(tmp_path, monkeypatch):
    (tmp_path / "sub.yml").write_text("lr: 0.001\nname: sub\n")
    (tmp_path / "main.yml").write_text(
        "dataset: brca\noptimizer: !include sub.yml\n"
    )
    import getpass

    user = getpass.getuser().lower().replace(" ", "_")
    (tmp_path / f"main.{user}.yml").write_text("dataset: kirp\n")
    cfg = Config(str(tmp_path / "main.yml")).read()
    assert cfg["dataset"] == "kirp"          # user overlay wins
    assert cfg["optimizer"]["lr"] == 0.001   # !include spliced


def test_flatten_unflatten_roundtrip():
    nested = Box({"a": {"b": {"c": 1}}, "d": [1, 2], "e": "x"})
    flat = flatten_config(nested)
    assert flat["a.b.c"] == 1 and flat["d"] == [1, 2]
    back = unflatten_config(flat)
    assert back["a"]["b"]["c"] == 1 and back["e"] == "x"


def test_remat_outputs_and_grads_match():
    """remat=True must be numerically identical (fwd + grads)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(2, 1, 16)).astype(np.float32))
    wsi = jnp.asarray(rng.normal(size=(2, 10, 8)).astype(np.float32))
    kw = dict(
        n_modalities=2, channel_dims=(16, 8), num_spatial_axes=(1, 1), out_dims=4,
        depth=2, l_c=4, l_d=8, x_heads=1, l_heads=1,
        cross_dim_head=4, latent_dim_head=4, self_per_cross_attn=1,
    )
    m_plain = HealNetModule(**kw)
    m_remat = HealNetModule(remat=True, **kw)
    params = m_plain.init(jax.random.PRNGKey(0), (tab, wsi))["params"]

    out_plain = m_plain.apply({"params": params}, (tab, wsi))
    out_remat = m_remat.apply({"params": params}, (tab, wsi))
    # remat changes XLA fusion boundaries -> last-ulp rounding differences
    np.testing.assert_allclose(
        np.asarray(out_remat), np.asarray(out_plain), rtol=1e-5, atol=1e-6
    )

    def loss(m):
        return lambda p: jnp.sum(jnp.sin(m.apply({"params": p}, (tab, wsi))))

    g_plain = jax.grad(loss(m_plain))(params)
    g_remat = jax.grad(loss(m_remat))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        g_remat,
        g_plain,
    )


def test_grad_accumulation_matches_full_batch():
    """accum_steps=4 must reproduce the full-batch gradient step exactly."""
    train, val = _data(32, 0), _data(16, 1)

    def run(accum):
        t = SurvivalTrainer(
            _module(), batch_size=8, epochs=2, early_stopping=False, gc_compat=1,
            seed=0, accum_steps=accum, prefetch=0,
        )
        return t.fit(train, val, verbose=False)

    full = run(1)
    accum = run(4)
    np.testing.assert_allclose(accum["train_loss"], full["train_loss"], rtol=1e-4)
    np.testing.assert_allclose(accum["val_loss"], full["val_loss"], rtol=1e-4)


def test_trainer_prefetch_same_results():
    train, val = _data(32, 0), _data(16, 1)

    def run(prefetch):
        t = SurvivalTrainer(
            _module(), batch_size=8, epochs=2, early_stopping=False, gc_compat=1,
            seed=0, prefetch=prefetch,
        )
        return t.fit(train, val, verbose=False)

    np.testing.assert_allclose(
        run(0)["train_loss"], run(4)["train_loss"], rtol=1e-6
    )
