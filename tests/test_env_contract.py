"""Behavioral contract tests ported from the reference suite.

Mirrors tests_gripper/test_sim.py: action/observation spaces, reset/step
shapes, exact first-step reward values, kinematic invariants (simplified
auto-descend, zero-action holds height), gripper close semantics. Where the
reference tests are stale against its own code (noted in SURVEY.md §4), we
assert the code's actual contract:
  * simplified depth obs is (64,64,2) — the padding-channel workaround
    (robot.py:193-199); the old test expected (64,64,1).
  * full_obs is 5 channels (rgb+depth+pad, robot.py:202) not 4.
"""

import numpy as np
import pytest

from deep_rl_grasping_tpu.envs.gym_adapter import (
    BoxSpace,
    DiscreteSpace,
    GymGraspEnv,
)

pytestmark = pytest.mark.physics  # heavy tier: real solver/env steps

CONFIGS = {
    "continuous": "tests/configs/test_continuous.yaml",
    "discrete": "tests/configs/test_discrete.yaml",
    "simplified_cont": "tests/configs/test_simplified_cont.yaml",
    "encoder": "tests/configs/test_encoder.yaml",
    "encoder_simp": "tests/configs/test_encoder_simp.yaml",
    "rgbd": "tests/configs/test_rgbd.yaml",
}

_cache = {}


def make_env(name):
    if name not in _cache:
        _cache[name] = GymGraspEnv(CONFIGS[name], seed=hash(name) % 2**31)
    return _cache[name]


ENV_NAMES = list(CONFIGS)


@pytest.mark.parametrize("name", ENV_NAMES)
def test_action_spaces(name):
    env = make_env(name)
    if env.is_simplified() and env.is_discrete():
        assert isinstance(env.action_space, DiscreteSpace)
        assert env.action_space.n == 3 * 2  # num_actions_pad * 3
    elif env.is_simplified():
        assert env.action_space.shape == (3,)
    elif env.is_discrete():
        assert isinstance(env.action_space, DiscreteSpace)
        assert env.action_space.n == 11
    else:
        assert env.action_space.shape == (5,)


@pytest.mark.parametrize("name", ENV_NAMES)
def test_observation_space(name):
    env = make_env(name)
    obs_shape = env.observation_space.shape
    if env.full_obs:
        # rgb+depth+pad channels (reference robot.py:202)
        assert obs_shape == (64, 64, 5)
    elif env.depth_obs and env.is_simplified():
        assert obs_shape == (64, 64, 2)
    elif env.depth_obs and not env.is_simplified():
        assert obs_shape == (64, 64, 2)
    elif not env.depth_obs and not env.is_simplified():
        assert obs_shape == (101,)
    elif not env.depth_obs and env.is_simplified():
        assert obs_shape == (100,)
    else:
        raise AssertionError


@pytest.mark.parametrize("name", ENV_NAMES)
def test_reset_return(name):
    env = make_env(name)
    obs = env.reset()
    assert obs.shape == env.observation_space.shape
    assert np.all(np.isfinite(obs))


@pytest.mark.parametrize("name", ENV_NAMES)
def test_step_return(name):
    env = make_env(name)
    env.reset()
    action = 0 if env.is_discrete() else np.zeros(env.action_space.shape, np.float32)
    obs, reward, done, info = env.step(action)
    assert obs.shape == env.observation_space.shape
    assert done == False  # noqa: E712


@pytest.mark.parametrize("name", ENV_NAMES)
def test_scene(name):
    env = make_env(name)
    env.reset()
    assert env.num_alive_objects >= 1


@pytest.mark.parametrize("name", ENV_NAMES)
def test_reward(name):
    """Exact first-step reward (test_sim.py:80-89): 0 for simplified,
    -(grasp_reward + delta_z_scale * max_translation) = -11 for the full
    shaped reward with the test config's values."""
    env = make_env(name)
    env.reset()
    action = 0 if env.is_discrete() else np.zeros(env.action_space.shape, np.float32)
    _, reward, _, _ = env.step(action)
    if env.is_simplified():
        assert reward == 0
    else:
        assert reward == -11


@pytest.mark.parametrize("name", ENV_NAMES)
def test_position(name):
    """Kinematics (test_sim.py:91-101): simplified auto-descends 5 mm per
    step; the full env's zero action holds height."""
    env = make_env(name)
    env.reset()
    pos_old, _ = env.get_pose()
    action = 0 if env.is_discrete() else np.zeros(env.action_space.shape, np.float32)
    env.step(action)
    pos_new, _ = env.get_pose()
    if env.is_simplified():
        assert np.isclose(pos_new[2], pos_old[2] - 0.005, atol=1e-3)
    else:
        assert np.isclose(pos_new[2], pos_old[2], atol=1e-3)


@pytest.mark.parametrize("name", ENV_NAMES)
def test_gripper_open(name):
    env = make_env(name)
    env.reset()
    env.close_gripper()
    assert env.get_gripper_width() <= 0.1


@pytest.mark.parametrize("name", ENV_NAMES)
def test_step_gripper(name):
    """The last action index / a -1 in the last action slot closes the
    gripper (test_sim.py:109-121)."""
    env = make_env(name)
    env.reset()
    if not env.is_simplified():
        if env.is_discrete():
            env.step(env.action_space.n - 1)
        else:
            action = np.zeros(env.action_space.shape, np.float32)
            action[-1] = -1.0
            env.step(action)
        assert env.get_gripper_width() <= 0.1


def test_eval_env_is_deterministic():
    """Eval uses a fixed RNG so object sequences repeat across evaluations
    (simulation.py:91-100)."""
    e1 = GymGraspEnv(CONFIGS["continuous"], evaluate=True)
    e2 = GymGraspEnv(CONFIGS["continuous"], evaluate=True)
    o1, o2 = e1.reset(), e2.reset()
    np.testing.assert_allclose(o1, o2)


def test_eval_forces_full_difficulty():
    env = GymGraspEnv(CONFIGS["continuous"], evaluate=True)
    assert float(env.curriculum.lam) == 1.0
