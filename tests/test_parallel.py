"""Mesh-parallel multi-agent step on the 8-device virtual CPU mesh (the
dryrun_multichip path, kept in-suite)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
class TestMeshParallel:
    def test_sharded_step_runs_and_scores(self):
        import __graft_entry__ as g
        from dvm_slam_tpu.parallel import multi_agent
        from dvm_slam_tpu.placerec import vocabulary

        n = 4
        rng = np.random.RandomState(1)
        cfg, m, img, T, K = g._small_setup()
        voc = vocabulary.train((rng.rand(400, 256) > 0.5).astype(np.uint8),
                               branch=4, depth=2, seed=0)
        mesh = multi_agent.make_mesh(n, jax.devices()[:n])
        step = multi_agent.build_multi_agent_step(mesh, cfg, voc)
        maps = multi_agent.stack_agents([m] * n)
        imgs = jnp.stack([img + 3 * i for i in range(n)])
        poses = jnp.stack([T] * n)
        Ks = jnp.stack([K] * n)
        T_new, inl, scores, maps_out = step(maps, imgs, poses, Ks)
        assert T_new.shape == (n, 7)
        assert bool(jnp.all(jnp.isfinite(T_new)))
        # BoW self-similarity is maximal on the diagonal
        s = np.asarray(scores)
        assert s.shape == (n, n)
        np.testing.assert_allclose(np.diag(s), 1.0, atol=1e-5)
        assert maps_out.kf_pose.shape[0] == n
