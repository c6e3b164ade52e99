"""Behavioral-constants audit vs SURVEY.md §8 (the values that define "same
behavior" as the reference). If one of these fails, a refactor silently
changed protocol/algorithm behavior."""

import numpy as np
import jax.numpy as jnp


def test_matcher_constants():
    from dvm_slam_tpu.ops import matching

    assert matching.TH_LOW == 50            # ORBmatcher.cc:36
    assert matching.TH_HIGH == 100          # ORBmatcher.cc:37
    assert matching.HISTO_BINS == 30        # ORBmatcher.cc:38


def test_orb_constants():
    from dvm_slam_tpu.ops import orb_descriptor, fast
    from dvm_slam_tpu.frontend.extractor import FrontendConfig

    assert orb_descriptor.PATCH_SIZE == 31  # ORBextractor.cc:71
    assert orb_descriptor.HALF_PATCH == 15  # :72
    assert fast.ARC_LEN == 9                # FAST-9/16
    cfg = FrontendConfig(height=480, width=752)
    assert cfg.n_features == 1250           # configs/euroc.yaml
    assert cfg.n_levels == 8
    assert abs(cfg.scale_factor - 1.2) < 1e-9
    assert cfg.ini_th == 20.0 and cfg.min_th == 7.0
    assert cfg.cell == 35                   # ORBextractor.cc:615


def test_optimizer_constants():
    from dvm_slam_tpu.tracking import pose_opt
    from dvm_slam_tpu.mapping import ba
    from dvm_slam_tpu.loopclosing import sim3_solver

    assert abs(pose_opt.CHI2_MONO - 5.991) < 1e-9   # Optimizer.cc:929
    assert abs(ba.CHI2_MONO - 5.991) < 1e-9
    assert abs(sim3_solver.CHI2_2D_99 - 9.210) < 1e-9  # Sim3Solver thresholds
    import inspect
    sig = inspect.signature(pose_opt.pose_optimization)
    assert sig.parameters["rounds"].default == 4     # 4 rounds
    assert sig.parameters["iters"].default == 10     # x 10 iterations


def test_two_view_constants():
    from dvm_slam_tpu.geometry import two_view

    assert abs(two_view.CHI2_H - 5.991) < 1e-9      # TwoViewReconstruction
    assert abs(two_view.CHI2_F - 3.841) < 1e-9
    import inspect
    sig = inspect.signature(two_view.reconstruct_two_views)
    assert sig.parameters["iters"].default == 200    # 200 RANSAC iterations
    assert sig.parameters["min_triangulated"].default == 50


def test_protocol_constants():
    from dvm_slam_tpu.multiagent import agent, transport

    assert agent.MIN_KEY_FRAME_SHARE_SIZE == 5       # orb_slam3_wrapper.cpp:36
    assert agent.MIN_BOW_SHARE_SIZE == 5             # :37
    assert agent.MIN_MAP_POINTS_FOR_SCALE_ADJUSTMENT == 500  # :38
    assert agent.MIN_KEY_FRAMES_FOR_MERGE == 12      # :466,551
    assert agent.CULLING_WINDOW == 3                 # :243
    assert agent.SCALE_ALIGN_BASE_INTERVAL == 5.0    # 5s timer, :123
    assert transport.QUEUE_DEPTH == 10               # keep-last-10 QoS, :39


def test_merge_verification_gates():
    from dvm_slam_tpu.loopclosing import merge, loop_detector

    assert merge.N_BOW_MATCHES == 20                 # LoopClosing.cc:647
    assert merge.N_SIM3_INLIERS == 20                # :651
    assert merge.N_PROJ_MATCHES == 50                # :653
    assert loop_detector.CONSISTENCY_REQUIRED == 3   # :451
    assert loop_detector.MAX_MISSES == 2             # :462


def test_tracker_gates():
    from dvm_slam_tpu.tracking.tracker import TrackerConfig
    from dvm_slam_tpu.frontend.extractor import FrontendConfig

    cfg = TrackerConfig(frontend=FrontendConfig(height=10, width=10))
    assert cfg.min_init_matches == 100               # Tracking.cc:2253
    assert abs(cfg.kf_ref_ratio - 0.9) < 1e-9        # :2849
    assert cfg.kf_min_inliers == 15


def test_spanning_tree():
    from dvm_slam_tpu.loopclosing import pose_graph

    covis = np.zeros((5, 5), np.int32)
    covis[0, 1] = covis[1, 0] = 100
    covis[1, 2] = covis[2, 1] = 90
    covis[0, 2] = covis[2, 0] = 10
    covis[2, 3] = covis[3, 2] = 50
    valid = np.array([True, True, True, True, False])
    parent = pose_graph.compute_spanning_tree(covis, valid)
    assert parent[0] == -1
    assert parent[1] == 0
    assert parent[2] == 1   # picks the 90 edge over the 10 edge
    assert parent[3] == 2
    assert parent[4] == -1
