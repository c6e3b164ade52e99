"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective code is
validated on `xla_force_host_platform_device_count=8` CPU devices exactly as
the driver's `dryrun_multichip` does.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/tpu: tests run on CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon sitecustomize registers the TPU backend before conftest runs, so
# the env var alone is not enough — force the platform through jax.config.
jax.config.update("jax_platforms", "cpu")
# the persistent compile cache is for the TPU path; CPU AOT artifacts are
# machine-feature sensitive and must not be reused across hosts
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np
import pytest

# --------------------------------------------------------------------------
# smoke tier: ONE end-to-end slice per subsystem, sized so `pytest -m smoke`
# verifies every round on a 1-core host in ~2 minutes (the 155-test fast lane
# takes >10 min there). Centralized here — not scattered marks — so the tier
# stays an explicit, reviewable contract.
# --------------------------------------------------------------------------
SMOKE = {
    # geometry / Lie algebra
    "test_lie.py::TestSim3::test_se3_embedding",
    "test_geometry.py::TestTriangulation::test_depth_and_parallax",
    "test_geometry.py::TestAlignment::test_ransac_with_outliers",
    # front end (pyramid+FAST+ORB e2e) and matching / two-view init
    "test_frontend.py::TestExtractor::test_full_frame",
    "test_matching_twoview.py::TestTwoView::test_general_scene_uses_essential",
    # mapping / bundle adjustment
    "test_local_ba_edges.py::test_fixed_observer_edges_to_nonwindow_points_survive",
    # place recognition
    "test_placerec.py::TestDatabase::test_merge_possibility_true_for_overlap",
    # loop closing
    "test_loopclosing.py::TestPoseGraph::test_loop_closure_distributes_drift",
    # multi-agent protocol pieces: codec hostility, TCP transport, native parity
    "test_merge_units.py::test_hostile_packets_raise_valueerror_only",
    "test_socket_transport.py::TestSocketTransport::test_service_roundtrip",
    "test_native.py::TestNativeCodec::test_cross_parity",
    # mesh / SPMD lane
    "test_parallel.py::TestSpmdStep::test_spmd_agent_step_shapes",
    # full tracking e2e through the System facade (+ trajectory export)
    "test_io_system.py::TestSystemFacade::test_tracks_and_exports",
    # async GBA fold-back
    "test_async_gba_unit.py::test_poll_gba_corrects_tracker_continuation",
    # IMU / inertial optimization
    "test_imu.py::TestPreintegration::test_matches_numerical_integration",
    "test_inertial.py::TestInertialOptimization::test_recovers_velocities_and_biases",
    # stereo depth path
    "test_stereo.py::TestStereoMatching::test_depth_from_disparity_matches_ground_truth",
    # pallas kernels (interpret mode on CPU)
    "test_pallas_orb.py::TestPallasOrb::test_equivalent_to_xla_path",
    # eval / recording invariants
    "test_recording_invariants.py::TestRecording::test_roundtrip_and_rate",
    # motion control
    "test_control_sim_viz.py::TestNmpc::test_drives_to_goal",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        if rel in SMOKE:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after every test module: a single long
    pytest process accumulates hundreds of XLA CPU executables across the
    slow e2e suite, which eventually segfaults the compiler (observed in
    jax 0.8 backend_compile_and_load after ~30 heavy tests). Per-module
    recompiles cost seconds; a crashed lane costs the whole run."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
