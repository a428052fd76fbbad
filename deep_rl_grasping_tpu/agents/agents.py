"""Interactive / scripted agents (reference: manipulation_main/agents/*).

`RandomAgent` mirrors agents/random_agent.py (action_space.sample). The
reference's `SliderAgent` drives PyBullet GUI debug sliders — there is no
GUI here; `ConstantAgent` provides the equivalent fixed-action probing tool
for headless debugging. `ScriptedGraspAgent` is the biased policy from
scripts/collect_dataset.py:16-63 (descend toward the nearest visible object,
close at 0.07 m, lift) used for autoencoder dataset collection.
"""

from __future__ import annotations

import numpy as np


class Agent:
    def act(self, obs, stochastic=True):
        raise NotImplementedError


class RandomAgent(Agent):
    def __init__(self, env, rng=None):
        self._space = env.action_space
        self._rng = rng or np.random.default_rng(0)

    def act(self, obs, stochastic=True):
        if hasattr(self._space, "n"):
            return int(self._rng.integers(self._space.n))
        return self._rng.uniform(-1.0, 1.0, self._space.shape).astype(np.float32)


class ConstantAgent(Agent):
    def __init__(self, action):
        self._action = action

    def act(self, obs, stochastic=True):
        return self._action


class ScriptedGraspAgent(Agent):
    """Descend-and-grasp heuristic for data collection
    (scripts/collect_dataset.py: move down 5 mm/step with lateral jitter,
    close the gripper near the surface, then lift)."""

    def __init__(self, env, rng=None, close_height=0.07, jitter=0.3):
        self.env = env
        self._rng = rng or np.random.default_rng(0)
        self._close_height = close_height
        self._jitter = jitter
        self._lift_steps = 0

    def reset(self):
        self._lift_steps = 0

    def act(self, obs, stochastic=True):
        pos, _ = self.env.get_pose()
        a = np.zeros(5, np.float32)
        if self._lift_steps > 0:
            self._lift_steps -= 1
            a[2] = -1.0  # local -z = world up
            a[4] = -1.0  # keep closed
            return a
        if pos[2] > self._close_height:
            a[:2] = self._rng.uniform(-self._jitter, self._jitter, 2)
            a[2] = 0.5  # local +z = descend
            a[4] = 1.0  # keep open
            return a
        self._lift_steps = 20
        a[4] = -1.0  # close
        return a
