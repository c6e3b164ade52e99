"""dvm_slam_tpu — TPU-native decentralized multi-agent monocular visual SLAM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
proroklab/DVM-SLAM (decentralized visual monocular C-SLAM, reference at
/root/reference): N agents each run a full monocular SLAM pipeline (ORB
front end, local mapping + bundle adjustment, BoW place recognition, Sim(3)
loop closing / map merging) and exchange keyframes, BoW vectors and
merge/coordinate-frame messages peer-to-peer with no central server.

Package layout:
  geometry/    SO3/SE3/Sim3 Lie groups, camera models, solvers (Sophus/g2o
               geometry equivalents, reference Thirdparty/Sophus, Sim3Solver.cc)
  ops/         array/Pallas compute kernels: FAST, rBRIEF, Hamming popcount
               matmul, grid NMS (reference ORBextractor.cc / ORBmatcher.cc)
  frontend/    ORB extraction pipeline + Frame construction (Frame.cc)
  tracking/    per-frame tracking step: motion-model / reference-KF tracking,
               pose-only optimization, keyframe decision (Tracking.cc)
  mapping/     struct-of-arrays MapState, local mapping, batched LM bundle
               adjustment with Schur complement (LocalMapping.cc, Optimizer.cc)
  placerec/    binary vocabulary tree, BoW transform/scoring, keyframe
               database, merge-possibility detection (DBoW2, KeyFrameDatabase.cc)
  loopclosing/ common-region detection, Sim3 pose-graph optimization, global
               BA, map merge (LoopClosing.cc, Optimizer.cc)
  multiagent/  typed message schema, peer state, broker transports, agent
               runtime, reference-frame tree (orb_slam3_wrapper.cpp, peer.cpp,
               src/interfaces/)
  parallel/    device-mesh batched multi-agent execution, collectives
  io/          dataset loaders (EuRoC/TUM/KITTI), config, trajectory export
  eval/        ATE/RPE evaluation, bandwidth accounting (src/evaluation/)
  models/      flagship composed pipelines (single/multi-agent SLAM systems)
  utils/       profiling, logging, uuid tables
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry pipelines (BA normal equations, Schur complements, triangulation)
# need true f32 accumulation: the TPU default of bf16 matmul inputs makes
# Gauss-Newton diverge. Integer popcount matmuls are unaffected. Kernels that
# can tolerate lower precision opt in locally.
_jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: the pipeline is many medium-size jitted
# programs; caching across processes turns minute-scale warmup into ms.
import os as _os

_cache_dir = _os.environ.get(
    "DVM_SLAM_TPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/dvm_slam_tpu_xla")
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass
