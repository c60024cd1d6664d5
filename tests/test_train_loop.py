"""End-to-end training loop tests on synthetic survival data (CPU)."""

import numpy as np
import pytest

from healnet_tpu.models import HealNetModule
from healnet_tpu.train import SurvivalTrainer, iterate_batches, make_optimizer, onecycle_lr


def _synthetic_survival(n=48, tab_d=32, patches=10, patch_d=16, seed=0, informative=True):
    rng = np.random.default_rng(seed)
    tab = rng.normal(size=(n, 1, tab_d)).astype(np.float32)
    wsi = rng.normal(size=(n, patches, patch_d)).astype(np.float32)
    # make survival depend on the first tabular feature so learning is possible
    signal = tab[:, 0, 0] if informative else rng.normal(size=n)
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


def _module():
    return HealNetModule(
        n_modalities=2,
        channel_dims=(32, 16),
        num_spatial_axes=(1, 1),
        out_dims=4,
        depth=1,
        l_c=8,
        l_d=16,
        x_heads=1,
        l_heads=2,
        cross_dim_head=8,
        latent_dim_head=8,
        self_per_cross_attn=0,
    )


def test_iterate_batches_pads_and_masks():
    data = _synthetic_survival(n=10)
    batches = list(iterate_batches(data, batch_size=4))
    assert len(batches) == 3
    assert all(b["tensors"][0].shape[0] == 4 for b in batches)
    assert batches[-1]["sample_mask"].sum() == 2


def test_onecycle_schedule_shape():
    sched = onecycle_lr(max_lr=0.008, total_steps=100)
    lrs = [float(sched(s)) for s in range(101)]
    assert abs(max(lrs) - 0.008) < 1e-6
    assert np.argmax(lrs) == 30  # pct_start=0.3
    assert lrs[0] == pytest.approx(0.008 / 25, rel=1e-3)
    assert lrs[-1] < lrs[0]


def test_trainer_reduces_loss_and_learns():
    train = _synthetic_survival(n=48, seed=0)
    val = _synthetic_survival(n=24, seed=1)
    trainer = SurvivalTrainer(
        _module(),
        loss_type="nll",
        batch_size=8,
        epochs=8,
        max_lr=5e-3,
        patience=8,
        early_stopping=False,
        gc_compat=1,
        seed=0,
    )
    res = trainer.fit(train, val, verbose=False)
    first, last = res["history"][0], res["history"][-1]
    assert last["train_loss"] < first["train_loss"]
    # informative signal -> better-than-chance concordance on train
    assert last["train_c_index"] > 0.55
    assert np.isfinite(res["val_c_index"])


def test_trainer_prefetch_matches_synchronous():
    # the DevicePrefetcher path (async double-buffered H2D) must be a pure
    # throughput optimization: identical losses to the synchronous path
    train = _synthetic_survival(n=32, seed=0)
    val = _synthetic_survival(n=16, seed=1)

    def run(prefetch):
        trainer = SurvivalTrainer(
            _module(), batch_size=8, epochs=2, early_stopping=False,
            seed=0, prefetch=prefetch,
        )
        return trainer.fit(train, val, verbose=False)["history"]

    h_pre, h_sync = run(2), run(0)
    for a, b in zip(h_pre, h_sync):
        assert a["train_loss"] == pytest.approx(b["train_loss"], rel=1e-6)
        assert a["val_loss"] == pytest.approx(b["val_loss"], rel=1e-6)


def test_trainer_early_stopping_restores_best():
    train = _synthetic_survival(n=32, seed=0)
    val = _synthetic_survival(n=16, seed=1)
    trainer = SurvivalTrainer(
        _module(), batch_size=8, epochs=30, patience=2, early_stopping=True, seed=0
    )
    res = trainer.fit(train, val, verbose=False)
    assert len(res["history"]) <= 30
    assert res["params"] is not None


def test_trainer_missing_ablation():
    train = _synthetic_survival(n=32, seed=0)
    val = _synthetic_survival(n=16, seed=1)
    test = _synthetic_survival(n=16, seed=2)
    trainer = SurvivalTrainer(
        _module(), batch_size=8, epochs=2, early_stopping=False, seed=0
    )
    res = trainer.fit(train, val, test, missing_ablation=True, verbose=False)
    assert "missing_performance" in res
    m50, momic, mwsi = res["missing_performance"]
    assert all(np.isfinite(v) for v in (m50, momic, mwsi))


def test_trainer_loss_types():
    train = _synthetic_survival(n=24, seed=0)
    val = _synthetic_survival(n=16, seed=1)
    for loss_type in ("ce_survival", "cox"):
        trainer = SurvivalTrainer(
            _module(), loss_type=loss_type, batch_size=8, epochs=1,
            early_stopping=False, seed=0,
        )
        res = trainer.fit(train, val, verbose=False)
        assert np.isfinite(res["train_loss"])


def test_checkpointer_roundtrip(tmp_path):
    import jax.numpy as jnp

    from healnet_tpu.train import Checkpointer

    ckpt = Checkpointer(tmp_path / "run")
    params = {"dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros(3)}}
    ckpt.save(step=5, params=params, metrics={"val_loss": 0.5})
    restored = ckpt.restore()
    np.testing.assert_allclose(np.asarray(restored["params"]["dense"]["kernel"]), 1.0)
    assert ckpt.latest_step() == 5
    ckpt.save_best(params, metrics={"c": 0.7})
    best = ckpt.restore_best()
    np.testing.assert_allclose(np.asarray(best["dense"]["bias"]), 0.0)


def test_resume_of_finished_fold_returns_real_metrics(tmp_path):
    # review r2: resuming a fold whose epochs are all checkpointed must not
    # return NaN metrics from an empty epoch loop
    train = _synthetic_survival(n=24, seed=0)
    val = _synthetic_survival(n=16, seed=1)

    def trainer():
        return SurvivalTrainer(
            _module(), batch_size=8, epochs=2, early_stopping=False, seed=0,
            checkpoint_dir=str(tmp_path / "ckpt"), resume=True,
        )

    trainer().fit(train, val, verbose=False)           # completes 2 epochs
    res = trainer().fit(train, val, verbose=False)     # fully resumed
    assert np.isfinite(res["train_loss"])
    assert np.isfinite(res["val_loss"])
    assert res["history"][-1].get("resumed_complete") is True


def test_cox_train_loss_event_weighted():
    # review r2: cox train-epoch aggregation weights by event counts (the
    # loss's own normalizer), matching evaluate()
    train = _synthetic_survival(n=24, seed=0)
    # force a mixed censoring pattern
    train["censorship"] = np.asarray([1, 0] * 12, np.float32)
    val = _synthetic_survival(n=16, seed=1)
    trainer = SurvivalTrainer(
        _module(), loss_type="cox", batch_size=8, epochs=1,
        early_stopping=False, gc_compat=1, seed=0,
    )
    res = trainer.fit(train, val, verbose=False)
    assert np.isfinite(res["train_loss"])


def test_missing_ablation_arena_matches_host():
    """Arena-mode eval must apply missing-modality presence masks: the slide
    modality arrives as indices, so the modality count includes it (a bare
    len(batch['tensors']) saw 1 modality and silently skipped the ablation)."""
    n, width, dim = 24, 10, 16
    data = _synthetic_survival(n=n, patches=width, patch_d=dim, seed=3)
    wsi = data["tensors"][1]
    lengths = np.full(n, width, dtype=np.int32)
    offsets = (np.arange(n) * width).astype(np.int32)
    arena = np.concatenate([wsi.reshape(-1, dim),
                            np.zeros((width, dim), np.float32)])
    kv_mask = np.ones((n, width), dtype=bool)
    arena_data = dict(
        tensors=(data["tensors"][0],), kv_masks=(None, kv_mask),
        patch_offsets=offsets, patch_lengths=lengths,
        y_disc=data["y_disc"], censorship=data["censorship"],
        event_time=data["event_time"],
    )

    def make(feature_arena):
        return SurvivalTrainer(
            _module(), batch_size=8, epochs=1, early_stopping=False,
            gc_compat=1, seed=0, feature_arena=feature_arena,
        )

    host = make(None)
    host.fit(data, data, verbose=False)
    ar = make(arena)
    ar.fit(arena_data, arena_data, verbose=False)

    for mode in (None, "50", "omic", "wsi"):
        lh, ch = host.evaluate(data, missing_mode=mode)
        la, ca = ar.evaluate(arena_data, missing_mode=mode)
        np.testing.assert_allclose(la, lh, rtol=1e-5, err_msg=f"loss {mode}")
        np.testing.assert_allclose(ca, ch, rtol=1e-6, err_msg=f"c {mode}")
    # ablations actually change the result (they were silently skipped before)
    full = ar.evaluate(arena_data)[0]
    assert abs(ar.evaluate(arena_data, missing_mode="wsi")[0] - full) > 1e-9


def _arena_form(data, width, dim):
    """Rewrite a host-tensor dataset into arena-indexed form."""
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


def test_fused_epochs_single_bucket_matches_stepwise():
    """With one bucket the fused lax.scan visits batches in the same shuffled
    order as the per-step path, so the trajectory is identical."""
    width, dim = 10, 16
    data = _synthetic_survival(n=24, patches=width, patch_d=dim, seed=5)
    arena_data, arena = _arena_form(data, width, dim)

    def run(fused):
        tr = SurvivalTrainer(
            _module(), batch_size=8, epochs=2, early_stopping=False,
            gc_compat=1, seed=0, feature_arena=arena, fused_epochs=fused,
        )
        return tr.fit(arena_data, arena_data, verbose=False)

    r_fused = run(True)
    r_step = run(False)
    np.testing.assert_allclose(
        r_fused["train_loss"], r_step["train_loss"], rtol=1e-5
    )
    np.testing.assert_allclose(
        r_fused["train_c_index"], r_step["train_c_index"], rtol=1e-6
    )
    np.testing.assert_allclose(
        r_fused["val_c_index"], r_step["val_c_index"], rtol=1e-6
    )


def test_fused_epochs_compose_with_mesh():
    """fused_epochs + SPMD mesh (VERDICT r2 item 6, 'build or bury' — built):
    the stacked scan axis stays unsharded while the inner batch shards over
    `data`; with one bucket the trajectory matches the stepwise mesh path."""
    from healnet_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    n, width, dim = 16, 8, 16
    data = _synthetic_survival(n=n, patches=width, patch_d=dim, seed=5)
    arena_data, arena = _arena_form(data, width, dim)

    def run(fused):
        trainer = SurvivalTrainer(
            _module(), batch_size=8, epochs=2, early_stopping=False,
            gc_compat=1, seed=0, mesh=mesh, prefetch=0,
            feature_arena=arena, fused_epochs=fused,
        )
        return trainer.fit(arena_data, arena_data, verbose=False)

    h_fused = run(True)["history"]
    h_step = run(False)["history"]
    for a, b in zip(h_fused, h_step):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"], rtol=1e-5)
        np.testing.assert_allclose(a["val_loss"], b["val_loss"], rtol=1e-5)


def test_resume_bit_equal_to_uninterrupted(tmp_path):
    """Crash+resume == never crashing: per-epoch derived rng streams mean a
    resumed run's epoch k uses exactly the shuffle order and dropout keys
    the uninterrupted run used."""
    data = _synthetic_survival(n=32, seed=7)

    def make(ckpt_dir, epochs, resume):
        return SurvivalTrainer(
            _module(), batch_size=8, epochs=epochs, early_stopping=False,
            gc_compat=1, seed=0, checkpoint_dir=ckpt_dir, resume=resume,
        )

    full = make(str(tmp_path / "a"), 3, False)
    res_full = full.fit(data, data, verbose=False)

    # identical config (same OneCycle horizon), "crashed" after epoch 2:
    # run the same 3-epoch fit, then discard epoch 3's checkpoint
    part = make(str(tmp_path / "b"), 3, False)
    part.fit(data, data, verbose=False)
    import shutil
    from healnet_tpu.train.checkpoint import Checkpointer

    ck = Checkpointer(str(tmp_path / "b"))
    assert ck.latest_step() == 3
    shutil.rmtree(ck.step_path(3))
    assert Checkpointer(str(tmp_path / "b")).latest_step() == 2

    resumed = make(str(tmp_path / "b"), 3, True)
    res_resumed = resumed.fit(data, data, verbose=False)

    import jax
    for a, b in zip(
        jax.tree_util.tree_leaves(res_full["params"]),
        jax.tree_util.tree_leaves(res_resumed["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    np.testing.assert_allclose(
        res_resumed["train_loss"], res_full["train_loss"], rtol=1e-5
    )


def test_checkpoint_retention_keeps_last_k(tmp_path):
    """keep_checkpoints prunes old epoch dirs; resume still finds the newest."""
    from healnet_tpu.train.checkpoint import Checkpointer

    data = _synthetic_survival(n=16, seed=2)
    tr = SurvivalTrainer(
        _module(), batch_size=8, epochs=5, early_stopping=False, gc_compat=1,
        seed=0, checkpoint_dir=str(tmp_path / "ck"), keep_checkpoints=2,
    )
    tr.fit(data, data, verbose=False)
    ck = Checkpointer(str(tmp_path / "ck"))
    steps = sorted(int(p.name.split("_")[1]) for p in ck.directory.glob("step_*"))
    assert steps == [4, 5]
    assert ck.latest_step() == 5


def test_checkpointer_ignores_stale_orbax_tmp_dirs(tmp_path):
    """A crash mid-save leaves step_XXXXXXXX.orbax-checkpoint-tmp-<ts> dirs;
    retention and latest_step must skip them instead of crashing — this is
    exactly the crash-recovery scenario resume exists for."""
    import jax.numpy as jnp

    from healnet_tpu.train import Checkpointer

    ck = Checkpointer(tmp_path / "run")
    params = {"w": jnp.ones(3)}
    ck.save(step=1, params=params)
    # simulate a crash mid-save of step 2
    (ck.directory / "step_00000002.orbax-checkpoint-tmp-1712345678").mkdir()
    assert ck.latest_step() == 1
    ck.save(step=2, params=params, keep_last=1)   # retention runs the parse
    assert ck.latest_step() == 2
    assert not ck.step_path(1).exists()


def test_fused_epochs_bf16_compute():
    """bf16 modules emit bfloat16 risks; the fused scan's cond branches must
    still type-match (caught live on TPU: cond branch dtype mismatch). The
    fp16 arena x bf16 compute combination mirrors the dress-rehearsal
    production config (data.feature_dtype: float16, precision: bf16)."""
    import jax.numpy as jnp

    width, dim = 10, 16
    data = _synthetic_survival(n=20, patches=width, patch_d=dim, seed=9)
    arena_data, arena = _arena_form(data, width, dim)
    module = HealNetModule(
        n_modalities=2, channel_dims=(32, dim), num_spatial_axes=(1, 1),
        out_dims=4, depth=1, l_c=8, l_d=16, x_heads=1, l_heads=2,
        cross_dim_head=8, latent_dim_head=8, self_per_cross_attn=0,
        dtype=jnp.bfloat16,
    )
    tr = SurvivalTrainer(
        module, batch_size=8, epochs=2, early_stopping=False, gc_compat=1,
        seed=0, feature_arena=arena.astype(np.float16), fused_epochs=True,
    )
    res = tr.fit(arena_data, arena_data, verbose=False)
    assert np.isfinite(res["train_loss"])
    assert np.isfinite(res["val_loss"])


def test_progress_schedule_matches_optax_trajectory():
    """Closed-form fraction schedules == the optax/torch step schedules to
    sub-step rounding (the horizon-free design must not change the LR/beta1
    curves, only how the horizon enters the program)."""
    import jax.numpy as jnp

    from healnet_tpu.train.schedule import (
        onecycle_beta1,
        onecycle_beta1_at,
        onecycle_lr_at,
    )

    T = 200
    sched = onecycle_lr(max_lr=8e-3, total_steps=T)
    b1_sched = onecycle_beta1(T)
    for s in range(0, T + 1, 7):
        lr_c = float(onecycle_lr_at(jnp.float32(s / T), 8e-3))
        lr_o = float(sched(s))
        assert abs(lr_c - lr_o) < 8e-3 * 0.02, (s, lr_c, lr_o)
        b1_c = float(onecycle_beta1_at(jnp.float32(s / T)))
        b1_o = float(b1_sched(s))
        assert abs(b1_c - b1_o) < 0.005, (s, b1_c, b1_o)
    # past-horizon steps hold the final LR (fused-epoch padding safety)
    assert float(onecycle_lr_at(jnp.float32(1.5), 8e-3)) == float(
        onecycle_lr_at(jnp.float32(1.0), 8e-3)
    )


def test_kfold_horizon_drift_never_retraces():
    """Folds with different split sizes (hence different total_steps) reuse
    ONE compiled train step — the schedule horizon is a traced argument, not
    a baked constant (VERDICT r2 item 4)."""
    trainer = SurvivalTrainer(
        _module(),
        loss_type="nll",
        batch_size=8,
        epochs=2,
        max_lr=5e-3,
        early_stopping=False,
        gc_compat=1,
        seed=0,
    )
    # deliberately uneven fold sizes: 48, 40, 56, 32, 44 samples
    for i, n in enumerate([48, 40, 56, 32, 44]):
        train = _synthetic_survival(n=n, seed=i)
        val = _synthetic_survival(n=16, seed=100 + i)
        res = trainer.fit(train, val, fold=i + 1, verbose=False)
        assert np.isfinite(res["history"][-1]["train_loss"])
    assert trainer._train_step._cache_size() == 1, (
        f"horizon drift re-traced the train step "
        f"({trainer._train_step._cache_size()} programs)"
    )


def test_horizon_free_trainer_matches_fixed_horizon_reference():
    """The trainer's horizon-free optimizer reproduces a manual loop built on
    the fixed-horizon optax optimizer (same data, same init) to tolerance."""
    import jax
    import jax.numpy as jnp
    import optax

    from healnet_tpu.train.losses import hazards_survival_risk, nll_loss
    from healnet_tpu.utils.train_utils import l1_norm

    train = _synthetic_survival(n=32, seed=0)
    val = _synthetic_survival(n=16, seed=1)
    epochs, bs = 3, 8
    trainer = SurvivalTrainer(
        _module(), loss_type="nll", batch_size=bs, epochs=epochs,
        max_lr=5e-3, early_stopping=False, gc_compat=1, seed=0, prefetch=0,
    )
    res = trainer.fit(train, val, verbose=False)

    # manual reference: identical init/shuffle/dropout streams, fixed-horizon opt
    module = _module()
    ref = SurvivalTrainer(
        _module(), loss_type="nll", batch_size=bs, epochs=epochs,
        max_lr=5e-3, early_stopping=False, gc_compat=1, seed=0, prefetch=0,
    )
    ref.init_params(train)
    params = ref.params
    total_steps = int(np.ceil(32 / bs)) * epochs
    opt = make_optimizer(5e-3, total_steps, cycle_momentum=True)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            logits = module.apply(
                {"params": p}, batch["tensors"],
                deterministic=False, rngs={"dropout": rng},
            )
            hz, S, risk = hazards_survival_risk(logits)
            surv = nll_loss(
                hz, S, batch["y_disc"], batch["censorship"],
                sample_weights=batch["sample_mask"],
            )
            return surv, surv

        (_, surv), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, surv

    import jax.random as jrandom

    base_rng = jrandom.PRNGKey(0 + 1000 * 1)
    losses = []
    for epoch in range(1, epochs + 1):
        rng = jrandom.fold_in(base_rng, epoch)
        np_rng = np.random.default_rng(0 + 1 + 977 * epoch)
        for batch in iterate_batches(train, bs, shuffle=True, rng=np_rng):
            dev = {
                k: (tuple(jnp.asarray(t) for t in v) if k == "tensors" else jnp.asarray(v))
                for k, v in batch.items()
            }
            rng, step_rng = jrandom.split(rng)
            params, opt_state, surv = step(params, opt_state, dev, step_rng)
            losses.append(float(surv))

    # epoch-mean losses of the manual fixed-horizon loop track the trainer
    per_epoch = np.asarray(losses).reshape(epochs, -1).mean(axis=1)
    got = np.asarray([h["train_loss"] for h in res["history"]])
    np.testing.assert_allclose(got, per_epoch, rtol=0.02, atol=5e-3)


def test_tracker_watch_logs_grad_and_param_norms(tmp_path):
    """wandb.watch parity (VERDICT r2 item 9): fitting with a tracker writes
    per-module + global gradient/parameter norms into the metrics stream."""
    import json

    from healnet_tpu.utils.tracking import Tracker

    train = _synthetic_survival(n=16, seed=0)
    val = _synthetic_survival(n=8, seed=1)
    tracker = Tracker(name="watch-test", log_dir=str(tmp_path))
    trainer = SurvivalTrainer(
        _module(), batch_size=8, epochs=2, early_stopping=False,
        gc_compat=1, seed=0, tracker=tracker, prefetch=0,
    )
    trainer.fit(train, val, verbose=False)
    tracker.finish()

    records = [
        json.loads(line)
        for line in (tracker.log_dir / "metrics.jsonl").read_text().splitlines()
    ]
    keys = set().union(*(r.keys() for r in records))
    assert "fold_1_grad_norm/global" in keys, sorted(keys)
    assert "fold_1_param_norm/global" in keys
    # per-top-level-module entries exist and are finite positive
    module_keys = [k for k in keys if k.startswith("fold_1_grad_norm/") and not k.endswith("global")]
    assert module_keys, sorted(keys)
    for r in records:
        for k, v in r.items():
            if "grad_norm" in k or "param_norm" in k:
                assert np.isfinite(v) and v >= 0, (k, v)
    # the global grad norm is positive (training actually produced gradients)
    gvals = [r["fold_1_grad_norm/global"] for r in records if "fold_1_grad_norm/global" in r]
    assert max(gvals) > 0


def test_progress_schedule_short_horizon_floor():
    """Degenerate horizons floor exactly like the step-based forms
    (total_steps -> ceil(1/pct_start)+1): step 1 of a 2-step run stays in
    the warmup phase instead of jumping deep into annealing."""
    import jax.numpy as jnp

    from healnet_tpu.train.schedule import (
        make_progress_optimizer,
        onecycle_lr_at,
        progress_hyperparams,
    )

    opt = make_progress_optimizer()
    params = {"w": jnp.zeros(3)}
    state = opt.init(params)
    state = state._replace(count=jnp.asarray(1))
    state = progress_hyperparams(state, jnp.float32(2.0), 8e-3)
    lr = float(state.hyperparams["learning_rate"])
    # flooring maps step 1 to frac 1/5 — mid-WARMUP (without the floor it
    # would evaluate at frac 0.5, already in the annealing phase)
    assert abs(lr - float(onecycle_lr_at(jnp.float32(1 / 5), 8e-3))) < 1e-9
    assert 8e-3 / 25.0 < lr < 8e-3  # strictly inside the warmup ramp


def test_eval_interval_skips_val_and_still_early_stops():
    """train_loop.eval_interval=2: odd epochs skip the val pass (NaN in
    history, no stale values), the final epoch always evaluates, and early
    stopping sees only evaluated epochs."""
    data = _synthetic_survival(n=24, seed=13)
    tr = SurvivalTrainer(
        _module(), batch_size=8, epochs=5, early_stopping=False,
        gc_compat=1, seed=0, eval_interval=2, prefetch=0,
    )
    res = tr.fit(data, data, verbose=False)
    hist = {h["epoch"]: h for h in res["history"]}
    assert np.isnan(hist[1]["val_loss"]) and np.isnan(hist[3]["val_loss"])
    assert np.isfinite(hist[2]["val_loss"]) and np.isfinite(hist[4]["val_loss"])
    assert np.isfinite(hist[5]["val_loss"])  # final epoch always evaluates
    assert np.isfinite(res["val_loss"])      # fold summary uses a real eval


def test_flat_optimizer_bit_identical_to_pytree():
    """optax.flatten'd Adam (make_optimizer flatten=True, the default) takes
    EXACTLY the same trajectory as per-leaf Adam: the update is elementwise
    (no cross-element reductions), so ravel/unravel changes only the executed
    fusion count, never a bit of any parameter."""
    import jax
    import jax.numpy as jnp
    import optax

    from healnet_tpu.train.schedule import make_optimizer

    rng = np.random.default_rng(7)
    params = {
        "a": {"w": jnp.asarray(rng.normal(size=(5, 3)), jnp.float32),
              "b": jnp.asarray(rng.normal(size=(3,)), jnp.float32)},
        "c": jnp.asarray(rng.normal(size=(4, 4)), jnp.float32),
    }

    def loss(p):
        return (jnp.sum(p["a"]["w"] ** 2) + jnp.sum(jnp.sin(p["a"]["b"]))
                + jnp.sum(jnp.abs(p["c"])))

    trajs = []
    for flatten in (False, True):
        opt = make_optimizer(5e-3, total_steps=20, flatten=flatten)
        state = opt.init(params)
        p = params
        for _ in range(6):
            grads = jax.grad(loss)(p)
            updates, state = opt.update(grads, state, p)
            p = optax.apply_updates(p, updates)
        trajs.append(p)
    for x, y in zip(jax.tree_util.tree_leaves(trajs[0]),
                    jax.tree_util.tree_leaves(trajs[1])):
        assert jnp.array_equal(x, y), "flat Adam diverged from per-leaf Adam"


def test_flat_progress_optimizer_state_surface_and_trajectory():
    """make_progress_optimizer(flatten=True) keeps the InjectHyperparamsState
    surface (.count/.hyperparams) that progress_hyperparams writes into, and
    matches the pytree variant bit-for-bit under the cycled schedule."""
    import jax
    import jax.numpy as jnp
    import optax

    from healnet_tpu.train.schedule import (
        make_progress_optimizer,
        progress_hyperparams,
    )

    params = {"w": jnp.linspace(-1.0, 1.0, 12, dtype=jnp.float32).reshape(4, 3),
              "b": jnp.ones((3,), jnp.float32)}

    def loss(p):
        return jnp.sum(p["w"] ** 2) + jnp.sum(p["b"] ** 2)

    outs = []
    for flatten in (False, True):
        opt = make_progress_optimizer(cycle_momentum=True, flatten=flatten)
        state = opt.init(params)
        assert hasattr(state, "count") and hasattr(state, "hyperparams")
        p = params
        for _ in range(5):
            state = progress_hyperparams(state, horizon=50, max_lr=8e-3)
            grads = jax.grad(loss)(p)
            updates, state = opt.update(grads, state, p)
            p = optax.apply_updates(p, updates)
        outs.append(p)
    for x, y in zip(jax.tree_util.tree_leaves(outs[0]),
                    jax.tree_util.tree_leaves(outs[1])):
        assert jnp.array_equal(x, y)


def test_l1_norm_flat_gradient_exact():
    """l1_norm(flat=True): the gradient is sign(leaf) elementwise either way
    — bit-identical to the per-leaf evaluation; the scalar value agrees to
    float summation-order tolerance."""
    import jax
    import jax.numpy as jnp

    from healnet_tpu.utils.train_utils import l1_norm

    rng = np.random.default_rng(3)
    params = {
        "x": jnp.asarray(rng.normal(size=(7, 5)), jnp.float32),
        "y": {"z": jnp.asarray(rng.normal(size=(11,)), jnp.float32)},
    }
    g_flat = jax.grad(lambda p: l1_norm(p, flat=True))(params)
    g_leaf = jax.grad(lambda p: l1_norm(p, flat=False))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_flat),
                    jax.tree_util.tree_leaves(g_leaf)):
        assert jnp.array_equal(a, b)
    v_flat = float(l1_norm(params, flat=True))
    v_leaf = float(l1_norm(params, flat=False))
    assert abs(v_flat - v_leaf) < 1e-4 * max(1.0, abs(v_leaf))
