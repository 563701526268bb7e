import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs them).
#
# Force CPU before any jax import: the environment defaults JAX_PLATFORMS to
# a single tunneled TPU; claiming it from tests would serialize against any
# other process using the chip (minutes of zero-CPU waiting).
# The environment also injects a TPU PJRT plugin into every interpreter via
# PYTHONPATH sitecustomize; once registered it intercepts XLA compilation
# (remote compile through a tunnel) even on the CPU backend, making each jit
# in the tests take minutes of zero-CPU waiting. It cannot be unregistered,
# so re-exec once with a clean environment. pytest capture is disabled in
# pytest.ini (-s) so the child's output reaches the terminal fd.
if os.environ.get("PALLAS_AXON_POOL_IPS") and os.environ.get("GENIE_TPU_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["GENIE_TPU_TEST_REEXEC"] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    argv = [sys.executable, "-m", "pytest"] + sys.argv[1:]
    os.execve(sys.executable, argv, env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Slow-test markers (VERDICT r3 item 10): `-m "not slow"` finishes < 5 min.
# Central list from measured --durations on the serial suite; anything
# >= ~15 s lands here (plus new long-running tests added by name).
SLOW_TESTS = {
    "tests/test_trainer.py::test_sensitivity_loss_optional_regularizer",
    "tests/test_pipeline.py::test_sweep_half_matches_f32",
    "tests/test_pipeline.py::test_pipeline_end_to_end_smoke",
    "tests/test_pipeline.py::test_use_subgraph_mode",
    "tests/test_workflow.py::test_full_project_workflow",
    "tests/test_detector.py::test_detector_forward_shapes_and_grad",
    "tests/test_trainer.py::test_generate_batch_shapes",
    "tests/test_trainer.py::test_dataset_prebuild_roundtrip",
    "tests/test_infer_components.py::test_local_marching_scales_to_real_day_candidate_counts",
    "tests/test_pipeline.py::test_sweep_retries_transient_batch_failures",
    "tests/test_pipeline.py::test_sweep_checkpoint_fingerprint_mismatch_restarts",
    "tests/test_graphdd.py::test_graphdd_relocation_improves_locations",
    "tests/test_pipeline.py::test_set_station_mask_retraces_all_stages",
    "tests/test_pipeline.py::test_sweep_checkpoint_resume",
    "tests/test_pipeline.py::test_associate_and_locate_with_perfect_weights",
    "tests/test_trainer.py::test_train_step_runs_and_improves",
    "tests/test_graphdd.py::test_calibration_reference_loss",
    "tests/test_pipeline.py::test_sweep_exhausted_retries_raise",
    "tests/test_trainer.py::test_fixed_subnetworks_used_in_windows",
    "tests/test_torch_parity_full.py::test_full_detector_forward_parity",
    "tests/test_infer_components.py::test_exact_enumeration_covers_11_to_15_source_band",
    "tests/test_trainer.py::test_preferential_sampling_gates_on_detectable_events",
    "tests/test_product_shard.py::test_sharded_detection_forward_matches_dense",
    "tests/test_pinn.py::test_pinn_learns_homogeneous_medium",
    "tests/test_detector.py::test_updated_model_definition_switches_architecture",
    "tests/test_graphdd.py::test_graphdd_with_memory_input",
    "tests/test_graphs.py::test_kmeans_packing_spherical",
    "tests/test_infer_components.py::test_locate_sources_batched_matches_planted_events",
    "tests/test_infer_components.py::test_pso_hull_reinit_and_depth_search",
    "tests/test_trainer.py::test_clean_data_interval_carves_false_picks",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.nodeid in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
