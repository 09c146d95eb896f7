"""Test configuration: force an 8-virtual-device CPU platform so sharding and
fold-parallel tests run without TPU hardware, and enable the persistent
compilation cache (the jitted whole-fold trainer takes ~30s to compile on
CPU)."""
import os

# Override unconditionally: the session environment may pre-set JAX_PLATFORMS
# to a TPU platform; tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# Force the count to 8 even when a smaller value leaked in from the
# environment (e.g. a distributed-test debug session set it to 1-2):
# multi-device tests would otherwise silently skip and the suite would go
# green with the sharding coverage gone.
import re as _re

flags = os.environ.get("XLA_FLAGS", "")
flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# The environment's TPU plugin (sitecustomize) overrides jax_platforms via
# jax.config at interpreter start; override it back to CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mmnm_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# ---- smoke/full test tiers (round 5) ---------------------------------------
# `make test-fast` runs `-m "not slow"`: a <=10-minute smoke tier keeping
# every unit/parity test, with the long CLI-integration chains (whole
# pipelines, sweeps, multi-process launches, notebook builds) deferred to
# the full run. Membership is maintained here from measured durations
# (--durations=80; see CLAUDE.md) rather than scattered per-file markers.
_SLOW_FILES = {
    "test_sweep_supervised.py", "test_uca_pipeline.py", "test_resources.py",
    "test_streaming.py", "test_pipeline_cli.py", "test_pipeline_smoke.py",
    "test_model_zoo_cli.py", "test_cli_shell.py",
    "test_distributed_multiprocess.py", "test_warmup.py",
    "test_bootstrap.py", "test_notebooks.py", "test_packed_cli.py",
    "test_doctor.py", "test_ep_cli.py", "test_fused_cli.py",
    "test_quality_parity.py", "test_score_cli.py",
    "test_variant_fold_parallel.py", "test_variant_mesh_cli.py",
    "test_graft_entry.py", "test_export.py",
}
_SLOW_TESTS = {
    ("test_resume.py", "test_cli_kill_and_resume"),
    ("test_serve.py", "test_ep_meshed_service_matches_unmeshed"),
    ("test_misc_paths.py", "test_train_cli_batch_size_flag"),
    ("test_fold_parallel_cli.py", "test_fold_parallel_matches_sequential_auc"),
    ("test_fold_parallel_cli.py",
     "test_mesh_flag_tensor_parallel_matches_unmeshed"),
    ("test_fused_heads.py", "test_fused_heads_cli_pipeline"),
    ("test_grouped.py", "test_cli_packed_routes_grouped_on_mixed_widths"),
    ("test_grouped.py", "test_ep_mesh_composes_with_grouped_layout"),
    ("test_grouped.py", "test_cli_ep_mesh_rides_grouped_on_mixed_widths"),
    ("test_variants.py", "test_nmpmcont_endtoend"),
    ("test_shardmap_step.py", "test_single_shard_matches_unsharded"),
    ("test_variant_resume.py", "test_nmpmcont_kill_and_resume_bit_identical"),
    ("test_decoder_nll.py", "test_fused_decoder_cli_pipeline"),
    ("test_packed_endtoend.py",
     "test_trainer_matches_per_modality_trajectory"),
    ("test_packed_endtoend.py", "test_fold_parallel_matches_sequential"),
    ("test_packed_endtoend.py", "test_cli_packed_routes_and_matches"),
    ("test_packed_endtoend.py",
     "test_ep_mesh_composes_with_dual_bank_layout"),
    ("test_packed_endtoend.py", "test_cli_ep_mesh_trains_dual_bank"),
    ("test_packed_regression.py",
     "test_shuffled_trainer_matches_per_modality_trajectory"),
    ("test_packed_regression.py", "test_fold_parallel_matches_sequential"),
    ("test_packed_regression.py", "test_cli_packed_routes_and_matches"),
    ("test_packed_dmvae.py", "test_trainer_matches_per_modality_trajectory"),
    ("test_packed_dmvae.py", "test_fold_parallel_matches_sequential"),
    ("test_packed_dmvae.py", "test_run_folds_routes_dmvae_packed"),
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        fname = os.path.basename(str(item.fspath))
        name = item.name.split("[")[0]
        if fname in _SLOW_FILES or (fname, name) in _SLOW_TESTS:
            item.add_marker(_pytest.mark.slow)
