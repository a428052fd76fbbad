"""End-to-end task behavior: a scripted grasp must succeed.

These are the tests the reference lacks entirely (SURVEY.md §4): they close
the loop physics -> detection -> reward -> status that training depends on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_rl_grasping_tpu.envs import rewards as rew
from deep_rl_grasping_tpu.envs.grasp_env import GraspEnv
from deep_rl_grasping_tpu.sim.types import FINGER_OPEN
from deep_rl_grasping_tpu.utils import config as cfg_util

pytestmark = pytest.mark.physics  # heavy tier: real solver/env steps



def _center_object_env(config_path, **env_kw):
    """Env with one object forced to the workspace center under the gripper."""
    cfg = cfg_util.load_config(config_path)
    cfg["curriculum"]["extent"] = [0.0001, 0.0001]  # objects at origin
    cfg["curriculum"]["max_objects"] = [1, 1]
    cfg["curriculum"]["min_objects"] = [1, 1]
    return GraspEnv(cfg, **env_kw)


@pytest.mark.slow
def test_full_env_scripted_grasp_succeeds():
    env = _center_object_env("tests/configs/test_continuous.yaml")
    lam = jnp.asarray(0.0)
    state, obs = jax.jit(lambda k: env.reset(k, lam))(jax.random.PRNGKey(3))
    step = jax.jit(lambda s, a: env.step(s, a, lam))

    descend = jnp.array([0.0, 0.0, 1.0, 0.0, 1.0], jnp.float32)
    close = jnp.array([0.0, 0.0, 0.0, 0.0, -1.0], jnp.float32)
    lift = jnp.array([0.0, 0.0, -1.0, 0.0, 0.0], jnp.float32)

    # Descend until near the surface (robot_height 0.18 -> ~0.08, 10 x 0.01)
    total_reward = 0.0
    success = False
    for _ in range(11):
        state, obs, r, done, info = step(state, descend)
        total_reward += float(r)
    state, obs, r, done, info = step(state, close)
    detected_after_close = env.object_detected(state.sim)
    for _ in range(12):
        state, obs, r, done, info = step(state, lift)
        total_reward += float(r)
        if bool(done):
            success = bool(info["is_success"])
            break
    assert bool(detected_after_close), "gripper failed to grab the object"
    assert success, "scripted grasp did not reach SUCCESS"
    # terminal reward granted (test config terminal_reward=10)
    assert float(r) == 10.0


@pytest.mark.slow
def test_simplified_env_protocol_succeeds_over_object():
    env = _center_object_env("tests/configs/test_simplified_cont.yaml")
    lam = jnp.asarray(0.0)
    # Key 0 draws a blind-protocol-graspable compound. The diversified
    # random_urdfs stand-ins (sim/objects.py) include flat plates / rods
    # that a *blind centered* descend-and-grasp legitimately misses (~60%
    # blind rate over keys 0-15); a trained policy aligns xy/yaw, the
    # scripted protocol here cannot, so the test pins a graspable draw.
    state, obs = jax.jit(lambda k: env.reset(k, lam))(jax.random.PRNGKey(0))
    step = jax.jit(lambda s, a: env.step(s, a, lam))
    # Zero action: auto-descend 5mm/step from 0.3 -> 0.07 in ~46 steps
    zero = jnp.zeros(3, jnp.float32)
    for i in range(60):
        state, obs, r, done, info = step(state, zero)
        if bool(done):
            break
    assert bool(done), "episode did not terminate"
    assert int(info["status"]) in (rew.SUCCESS, rew.FAIL)
    assert bool(info["is_success"]), (
        "descend-and-grasp protocol failed over a centered object"
    )
    assert float(r) == 1.0


@pytest.mark.slow
def test_table_clearing_removes_objects():
    cfg = cfg_util.load_config("tests/configs/test_continuous.yaml")
    cfg["curriculum"]["extent"] = [0.06, 0.06]
    cfg["curriculum"]["max_objects"] = [2, 2]
    cfg["curriculum"]["min_objects"] = [2, 2]
    cfg["reward"].update(
        custom=True, table_clearing=True, terminal_reward=100.0,
        lift_success=10.0, time_penalty=1.0, shaped=True,
    )
    env = GraspEnv(cfg)
    lam = jnp.asarray(0.0)
    state, obs = jax.jit(lambda k: env.reset(k, lam))(jax.random.PRNGKey(0))
    step = jax.jit(lambda s, a: env.step(s, a, lam))
    n0 = int(jnp.sum(state.sim.objects.alive.astype(jnp.int32)))

    close = jnp.array([0.0, 0.0, 0.0, 0.0, -1.0], jnp.float32)
    lift = jnp.array([0.0, 0.0, -1.0, 0.0, 0.0], jnp.float32)
    # Steer over the highest object, then descend (actions are gripper-local:
    # dx_local = dx_world, dy_local = -dy_world at yaw 0; robot.py:251-262).
    for _ in range(18):
        obj = state.sim.objects
        z = jnp.where(obj.alive, obj.pos[:, 2], -jnp.inf)
        target_xy = obj.pos[jnp.argmax(z), :2]
        q = state.sim.gripper.q
        err = np.asarray(target_xy - q[:2])
        act = np.zeros(5, np.float32)
        act[0] = np.clip(err[0] / 0.01, -1, 1)
        act[1] = np.clip(-err[1] / 0.01, -1, 1)
        act[2] = 1.0 if float(q[2]) > 0.0735 else 0.0
        act[4] = 1.0
        state, obs, r, done, info = step(state, jnp.asarray(act))
        if float(state.sim.gripper.q[2]) <= 0.0735 and np.linalg.norm(err) < 0.004:
            break
    state, obs, r, done, info = step(state, close)
    cleared = False
    for _ in range(12):
        state, obs, r, done, info = step(state, lift)
        n_now = int(jnp.sum(state.sim.objects.alive.astype(jnp.int32)))
        if n_now < n0:
            cleared = True
            # lift_success reward, episode continues (rewards.py:119-122)
            assert float(r) == 10.0
            assert not bool(done)
            # info reports the post-clear alive count (the eval protocol
            # derives cleared-objects-per-episode from it)
            assert int(info["objects_alive"]) == n_now == n0 - 1
            break
    assert cleared, "table clearing never removed the lifted object"
    # gripper reopened after the clear
    assert float(state.sim.gripper.finger_target) == FINGER_OPEN


def test_fail_on_stall_simplified():
    """SimplifiedReward stall detection: pressing into the floor with no
    horizontal progress FAILs (rewards.py:81-84)."""
    cfg = cfg_util.load_config("tests/configs/test_simplified_cont.yaml")
    # no objects in reach: spawn them far out by making extent tiny but
    # placing the gripper hunt elsewhere is not possible -> rely on stall:
    cfg["curriculum"]["robot_height"] = [0.3, 0.3]
    env = GraspEnv(cfg)
    lam = jnp.asarray(0.0)
    state, obs = jax.jit(lambda k: env.reset(k, lam))(jax.random.PRNGKey(1))
    step = jax.jit(lambda s, a: env.step(s, a, lam))
    # Command pure yaw rotation: auto-descend still happens (5 mm), so the
    # robot falls until it reaches 0.07 or stalls on an object pile.
    act = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    done = False
    for i in range(env.time_horizon):
        state, obs, r, done, info = step(state, act)
        if bool(done):
            break
    assert bool(done)


@pytest.mark.slow
def test_scripted_expert_grasp_rate_floor():
    """Statistical sim-fidelity gate (round-2 VERDICT item 2): the scripted
    expert at lambda=0 must succeed >= 90% — the reference's PyBullet world
    virtually never drops a centered descend-close-lift grasp, and this rate
    upper-bounds the demo quality AND the achievable policy. (Measured
    ceiling with zero noise: 98.7-99.7%; training noise costs a point or
    two; the batch here is small so the bound is loose.)"""
    from deep_rl_grasping_tpu.envs import scripted
    from deep_rl_grasping_tpu.envs.grasp_env import BatchedGraspEnv

    cfg = cfg_util.load_config("configs/sac_full_flagship.yaml")
    cfg["tpu"]["num_envs"] = 16
    env = GraspEnv(cfg)
    benv = BatchedGraspEnv(env, 16, use_pallas=False)
    cur = benv.init_curriculum()
    states, obs = jax.jit(lambda k: benv.reset(k, cur))(jax.random.PRNGKey(0))

    def body(carry, _):
        states, k, n_done, n_succ = carry
        k, ka = jax.random.split(k)
        keys = jax.random.split(ka, 16)
        actions = jax.vmap(
            lambda s, kk: scripted.scripted_full_action(env, s, kk)
        )(states, keys)
        states, _obs, r, dones, infos, _c = benv.step(states, actions, cur)
        return (
            states, k,
            n_done + dones.sum(dtype=jnp.int32),
            n_succ + (dones & infos["is_success"]).sum(dtype=jnp.int32),
        ), None

    run = jax.jit(lambda st, k: jax.lax.scan(
        body, (st, k, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)),
        None, length=60,
    )[0])
    states, _, n_done, n_succ = run(states, jax.random.PRNGKey(7))
    n_done, n_succ = int(n_done), int(n_succ)
    assert n_done >= 20, f"too few episodes finished ({n_done})"
    rate = n_succ / n_done
    assert rate >= 0.90, f"scripted grasp rate {rate:.2f} < 0.90 ({n_done} eps)"
