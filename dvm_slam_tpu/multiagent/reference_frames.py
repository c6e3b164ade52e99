"""Sim(3) reference-frame tree.

Mirrors `ReferenceFrameManager` (`src/slam_system/include/reference_frame_manager.h`):
every agent starts with `world -> robotN/origin` (the reference initializes
it with a 90-degree rotation about x to map camera-z-forward onto world-up
conventions, `reference_frame_manager.h:5-15`); after a merge the loser
re-parents its origin under the winner's origin and composes
`world_to_origin = world_to_parent * parent_to_current`
(`reference_frame_manager.h:17-22`).
"""

from __future__ import annotations

import numpy as np

from ..geometry import lie


def _initial_world_to_origin():
    import jax.numpy as jnp

    q = lie.so3_exp(jnp.asarray(np.array([np.pi / 2, 0.0, 0.0], np.float32)))
    T = jnp.concatenate([q, jnp.zeros(3), jnp.ones(1)])
    return np.asarray(T)


class ReferenceFrameManager:
    def __init__(self, agent_id: int):
        self.agent_id = agent_id
        self.origin_frame = f"robot{agent_id}/origin"
        self.parent_frame = "world"
        self.world_to_origin = _initial_world_to_origin()  # Sim3 [8]

    def set_parent_frame(self, parent_agent_id: int, parent_to_current):
        """Re-parent after a merge: `parent_to_current` is the Sim3 taking
        this agent's (old) origin coordinates into the parent's origin
        coordinates... composed exactly like `setParentFrame`."""
        import jax.numpy as jnp

        self.parent_frame = f"robot{parent_agent_id}/origin"
        self.world_to_origin = np.asarray(
            lie.sim3_mul(jnp.asarray(self.world_to_origin), jnp.asarray(parent_to_current))
        )

    def tree(self):
        return {
            "frame": self.origin_frame,
            "parent": self.parent_frame,
            "world_to_origin": self.world_to_origin.tolist(),
        }
