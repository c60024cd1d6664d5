"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding paths
(mesh/pjit/shard_map) are exercised without TPU hardware — the strategy the
reference lacks entirely (SURVEY.md §4 rebuild implication).

Note: this image boots JAX with an `axon` TPU platform plugin registered from
sitecustomize (which overrides JAX_PLATFORMS), so we must force the CPU
backend via `jax.config` before the first backend initialisation.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the suite is compile-dominated; persist compiled executables across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/healnet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# --------------------------------------------------------------- fast tier
#
# `pytest -m "not slow"` is the sub-2-minute smoke tier (VERDICT r3 weak #1):
# it still imports and exercises every module; the entries below are the
# compile-heavy tests (Pallas interpret mode, SPMD meshes, pipeline e2e,
# live-torch parity) that dominate the ~16 min full-suite wall time.
# scripts/ci.sh runs fast-then-slow. Matching is by substring against the
# test's nodeid, so a whole file or a single parametrised case can be listed.
SLOW_NODEID_PARTS = [
    "test_multihost.py",
    "test_parallel.py",
    "test_seq_attention.py",
    "test_quantize.py",
    "test_training_parity.py",
    "test_torch_parity.py",
    "test_pipeline.py",
    "test_train_loop.py::test_fused_epochs",
    "test_train_loop.py::test_trainer_loss_types",
    "test_train_loop.py::test_trainer_reduces_loss_and_learns",
    "test_train_loop.py::test_resume_bit_equal_to_uninterrupted",
    "test_train_loop.py::test_horizon_free_trainer",
    "test_train_loop.py::test_missing_ablation",
    "test_train_loop.py::test_trainer_checkpoint",
    "test_baselines.py::test_baselines_in_trainer",
    "test_baselines.py::test_bag_baselines_tokens_layout_equivalence",
    "test_baselines.py::test_multimodn_encoders",
    "test_etl.py::test_trainer_consumes_streaming_tcga",
    "test_etl.py::test_ragged_bags_patch_attention_layout",
    "test_explainer_tasks.py::test_explainer_end_to_end",
    "test_explainer_tasks.py::test_resnet50_feature_extractor_shapes",
    "test_resnet_import.py",
    "test_healnet.py::test_healnet_trimodal_3d",
    "test_misc.py::test_remat_outputs_and_grads_match",
    "test_misc.py::test_trainer_checkpoint_resume",
    "test_serving.py::test_predictor_kv_masks_ragged_bags",
    "test_fused_project.py::test_model_logits_identical_across_impls",
    "test_flash_attention.py::test_dropout",
    "test_notebooks.py",
    "test_train_loop.py::test_trainer_prefetch_matches_synchronous",
    "test_train_loop.py::test_trainer_early_stopping_restores_best",
    "test_train_loop.py::test_checkpoint_retention_keeps_last_k",
    "test_train_loop.py::test_cox_train_loss_event_weighted",
    "test_train_loop.py::test_resume_of_finished_fold_returns_real_metrics",
    "test_healnet.py::test_healnet_unimodal",
    "test_baselines.py::test_baselines_honor_presence_masks",
    "test_baselines.py::test_mcat_shapes",
    "test_baselines.py::test_multimodn_module_loss_and_logits",
    "test_baselines.py::test_multimodn_bespoke_trainer_protocol",
    "test_baselines.py::test_mcat_multi_signature_towers",
    "test_baselines.py::test_mcat_bilinear_fusion",
    "test_fused_project.py::test_input_cotangent_parity",
    "test_fused_project.py::test_param_grad_parity",
    "test_misc.py::test_grad_accumulation_matches_full_batch",
    "test_misc.py::test_trainer_prefetch_same_results",
    "test_flash_attention.py::test_module_flash_dropout_trains",
    "test_flash_attention.py::test_gradient_parity",
    "test_runtime.py::test_cindex_native_speed",
]


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy test excluded from the fast tier"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(part in item.nodeid for part in SLOW_NODEID_PARTS):
            item.add_marker(pytest.mark.slow)
