"""Mesh-parallel multi-agent execution.

The reference scales by running N ROS processes, one per robot
(`orb_slam3_wrapper.cpp:110-121` static peer table); here N agents map onto
an `("agent",)` device mesh: every per-agent pipeline stage (ORB extraction,
two-stage tracking, windowed BA) runs as the SAME program on each mesh slice
via `shard_map` — pure SPMD, zero cross-slice traffic — and the inter-agent
covisibility/merge-detection exchange rides XLA collectives
(`all_gather` over ICI) instead of DDS.

This is the §2.6-2 mapping from SURVEY.md: "N agents = N mesh slices;
batched front ends; keyframe exchange = device-to-device collectives for
co-located agents" (the host broker in `multiagent/` remains the cross-host
path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..frontend.extractor import FrontendConfig, extract
from ..mapping import ba, map_state
from ..placerec import vocabulary
from ..tracking import tracker as trk


def make_mesh(n_agents: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[:n_agents]
    return Mesh(np.asarray(devices), ("agent",))


def stack_agents(pytrees):
    """Stack per-agent pytrees (e.g. MapStates) along a leading agent axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *pytrees)


@partial(jax.jit, static_argnames=("config", "voc_branch", "voc_words"))
def _agent_step(m, img, T_pred, K, voc_levels, voc_idf,
                config: trk.TrackerConfig, voc_branch: int, voc_words: int):
    """One agent's per-frame compute: extract -> track -> local BA window ->
    BoW of the tracked frame. Runs identically on every mesh slice."""
    fc = config.frontend
    m_one = jax.tree.map(lambda x: x[0], m)  # drop the sliced agent dim
    frame = extract(img[0], fc)
    res = trk.track_frame(m_one, frame, T_pred[0], K[0], config)
    bow = vocabulary.bow_vector(
        voc_levels, voc_idf, frame.desc, frame.valid, voc_branch, voc_words
    )
    return res.T_cw[None], res.n_inliers[None], bow[None]


def build_multi_agent_step(mesh: Mesh, config: trk.TrackerConfig,
                           voc: vocabulary.Vocabulary, ba_local=4, ba_fixed=2,
                           ba_pts=256, ba_iters=2):
    """Returns a jitted SPMD step:
        (maps [A,...], imgs [A,H,W], poses [A,7], K [A,4])
          -> (poses' [A,7], inliers [A], merge_scores [A,A], maps' [A,...])

    Per agent slice: front end + tracking + windowed BA; then one
    `all_gather` of the per-agent BoW vectors over the agent axis and the
    full cross-agent BoW similarity matrix (the merge-possibility candidate
    score of SURVEY §2.6-2) computed locally on every slice.
    """
    fc = config.frontend
    voc_levels, voc_idf = voc.device_arrays()
    branch, words = voc.branch, voc.n_words

    def step(m, img, T_pred, K):
        T_new, inl, bow = _agent_step(
            m, img, T_pred, K, voc_levels, voc_idf, config, branch, words
        )
        # windowed BA around the newest keyframe on this slice
        center = jnp.maximum(m.n_kf[0] - 1, 0)
        m_one = jax.tree.map(lambda x: x[0], m)
        from ..mapping import local_mapping
        m_ba, _ = local_mapping.local_ba(
            m_one, center, K[0], n_local=ba_local, n_fixed=ba_fixed,
            n_pts=ba_pts, iters=ba_iters,
            n_levels=fc.n_levels, scale_factor=fc.scale_factor,
        )
        m_out = jax.tree.map(lambda x: x[None], m_ba)
        # covisibility/merge exchange: gather every agent's BoW (ICI
        # all_gather) and score all pairs on each slice
        all_bows = jax.lax.all_gather(bow[0], "agent")        # [A,W]
        scores = 1.0 - 0.5 * jnp.sum(
            jnp.abs(all_bows[:, None, :] - all_bows[None, :, :]), -1
        )
        return T_new, inl, scores, m_out

    in_specs = (
        jax.tree.map(lambda _: P("agent"), map_state.create(1, 1, 1)),
        P("agent"), P("agent"), P("agent"),
    )
    out_specs = (
        P("agent"), P("agent"), P(),  # scores replicated
        jax.tree.map(lambda _: P("agent"), map_state.create(1, 1, 1)),
    )
    fn = shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)
    return jax.jit(fn)
