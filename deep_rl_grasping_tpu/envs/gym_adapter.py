"""Host-side single-env adapter exposing the reference's gym surface.

Wraps the pure-function GraspEnv in the classic mutable-env API so the
reference's behavioral contract (tests_gripper/test_sim.py and
manipulation_main/utils.py's debug path) carries over:

  reset() -> obs, step(a) -> (obs, reward, done, info), action_space,
  observation_space, get_pose(), close_gripper(), open_gripper(),
  get_gripper_width(), object_detected(), is_simplified(), is_discrete()

This adapter is for tests / interactive debugging / dataset collection; the
training path uses BatchedGraspEnv directly on device.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from deep_rl_grasping_tpu.envs import curriculum as curr
from deep_rl_grasping_tpu.envs import rewards as rew
from deep_rl_grasping_tpu.envs.grasp_env import GraspEnv
from deep_rl_grasping_tpu.sim import physics
from deep_rl_grasping_tpu.sim.types import FINGER_CLOSED, FINGER_OPEN
from deep_rl_grasping_tpu.utils import transforms


@dataclass
class BoxSpace:
    low: float
    high: float
    shape: tuple

    def sample(self, rng=np.random):
        return rng.uniform(self.low, self.high, self.shape).astype(np.float32)

    @property
    def dtype(self):
        return np.float32


@dataclass
class DiscreteSpace:
    n: int

    def sample(self, rng=np.random):
        return int(rng.randint(self.n)) if hasattr(rng, "randint") else int(rng.integers(self.n))

    @property
    def shape(self):
        return ()


class GymGraspEnv:
    Status = rew

    def __init__(self, config, evaluate=False, test=False, validate=False, seed=0):
        self.env = GraspEnv(config, evaluate=evaluate, test=test, validate=validate)
        # Eval uses a fixed seed stream so object sequences repeat across
        # evaluations (reference simulation.py:91-100, RandomState(1)).
        self._key = jax.random.PRNGKey(1 if evaluate else seed)
        self._curr = curr.CurriculumState.init(
            self.env.curriculum_spec, evaluate=evaluate
        )
        self._state = None
        self._jit_reset = jax.jit(lambda k, lam: self.env.reset(k, lam))
        self._jit_step = jax.jit(
            lambda s, a, lam: self.env.step(s, a, lam)
        )
        self._jit_run = jax.jit(
            lambda s, n: physics.run(s, self.env.sim_params, n), static_argnums=1
        )

        if self.env.discrete:
            self.action_space = DiscreteSpace(self.env.num_actions)
        else:
            self.action_space = BoxSpace(-1.0, 1.0, (self.env.action_dim,))
        if self.env.depth_obs or self.env.full_obs:
            self.observation_space = BoxSpace(0.0, 255.0, self.env.obs_shape)
        else:
            self.observation_space = BoxSpace(-1.0, 1.0, self.env.obs_shape)

    # -- gym API ------------------------------------------------------------

    def reset(self):
        self._key, rk = jax.random.split(self._key)
        self._state, obs = self._jit_reset(rk, self._curr.lam)
        return np.asarray(obs)

    def step(self, action):
        if self.env.discrete:
            action = jnp.asarray(int(action), jnp.int32)
        else:
            action = jnp.asarray(action, jnp.float32)
        self._state, obs, reward, done, info = self._jit_step(
            self._state, action, self._curr.lam
        )
        done = bool(done)
        if done:
            self._curr = curr.update(
                self.env.curriculum_spec,
                self._curr,
                jnp.asarray([True]),
                jnp.asarray([bool(info["is_success"])]),
            )
        return (
            np.asarray(obs),
            float(reward),
            done,
            {k: np.asarray(v) for k, v in info.items()},
        )

    def close(self):
        pass

    # -- reference task API (robot.py:264-306) ------------------------------

    @property
    def depth_obs(self):
        return self.env.depth_obs

    @property
    def full_obs(self):
        return self.env.full_obs

    def is_simplified(self):
        return self.env.simplified

    def is_discrete(self):
        return self.env.discrete

    def get_pose(self):
        q = self._state.sim.gripper.q
        pos = np.asarray(q[:3])
        quat = np.asarray(
            transforms.quat_mul(
                transforms.quat_from_euler(0.0, 0.0, float(q[3])),
                transforms.quat_from_euler(np.pi, 0.0, 0.0),
            )
        )
        return pos, quat

    def get_gripper_width(self):
        return float(physics.gripper_width(self._state.sim.gripper.q))

    def object_detected(self, tol=0.005):
        return bool(self.env.object_detected(self._state.sim, tol))

    def close_gripper(self):
        self._set_fingers(FINGER_CLOSED, close=True)

    def open_gripper(self):
        self._set_fingers(FINGER_OPEN, close=False)

    def _set_fingers(self, target, close):
        sim = self._state.sim
        g = sim.gripper.replace(
            finger_target=jnp.asarray(target, jnp.float32),
            gripper_close=jnp.asarray(close),
        )
        sim = self._jit_run(sim.replace(gripper=g), self.env.gripper_substeps)
        self._state = self._state.replace(sim=sim)

    @property
    def num_alive_objects(self):
        return int(jnp.sum(self._state.sim.objects.alive.astype(jnp.int32)))

    @property
    def curriculum(self):
        return self._curr
