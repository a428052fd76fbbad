"""Reward functions as pure state transitions.

Ports of the three reference reward classes (gripperEnv/rewards.py:4-143):

* `shaped_reward`       — Reward: terminal on lifting a held object by
                          lift_dist, shaped grasp/delta-z intermediate,
                          unconditional time penalty (rewards.py:25-52,
                          including the quirk that the penalty also applies
                          while grasping — kept, the contract tests encode it).
* `custom_reward`       — ShapedCustomReward: configurable time penalty and
                          the table-clearing protocol (rewards.py:99-143).
* simplified reward     — SimplifiedReward's descend/stall logic
                          (rewards.py:68-90); its close-and-lift grasp attempt
                          is physics and therefore lives in the env step
                          (grasp_env.py), which calls `simplified_outcome`.

Status codes follow RobotEnv.Status (robot.py:40-44).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import struct

RUNNING = 0
SUCCESS = 1
FAIL = 2
TIME_LIMIT = 3


@dataclass(frozen=True)
class RewardSpec:
    custom: bool
    shaped: bool
    terminal_reward: float
    grasp_reward: float
    delta_z_scale: float
    time_penalty: float
    table_clearing: bool
    lift_success: float
    stalled: bool
    max_delta_z: float  # = robot max_translation (rewards.py:12)

    @classmethod
    def from_config(cls, config):
        r = config["reward"]
        terminal = float(r.get("terminal_reward", 10000.0) or 10000.0)
        return cls(
            custom=bool(r.get("custom", False)),
            shaped=bool(r.get("shaped", True)),
            terminal_reward=terminal,
            grasp_reward=float(r.get("grasp_reward", 100.0) or 100.0),
            delta_z_scale=float(r.get("delta_z_scale", 1000.0) or 1000.0),
            time_penalty=float(r.get("time_penalty", 200.0) or 200.0),
            table_clearing=bool(r.get("table_clearing", False)),
            lift_success=float(r.get("lift_success") or terminal),
            stalled=bool(r.get("stalled", True)),
            max_delta_z=float(config["robot"]["max_translation"]),
        )


@struct.dataclass
class RewardState:
    lifting: jnp.ndarray       # () bool
    start_height: jnp.ndarray  # ()
    old_height: jnp.ndarray    # ()

    @classmethod
    def init(cls, robot_height):
        h = jnp.asarray(robot_height, jnp.float32)
        return cls(
            lifting=jnp.asarray(False),
            start_height=h,
            old_height=h,
        )


def shaped_reward(spec: RewardSpec, rs: RewardState, robot_height, detected, lift_dist):
    """Reward / ShapedCustomReward without table clearing.

    Returns (reward, status, new RewardState, clear_flag=False).
    The only difference between the two reference classes outside table
    clearing is the time-penalty magnitude (rewards.py:45-49 vs 135-139).
    """
    start_h = jnp.where(rs.lifting, rs.start_height, robot_height)
    lifting = detected
    lifted = detected & (robot_height - start_h > lift_dist)

    delta_z = robot_height - rs.old_height
    intermediate = jnp.where(
        detected & spec.shaped, spec.grasp_reward + spec.delta_z_scale * delta_z, 0.0
    )
    if spec.custom:
        penalty = spec.time_penalty if spec.shaped else 0.01
    else:
        penalty = (
            spec.grasp_reward + spec.delta_z_scale * spec.max_delta_z
            if spec.shaped
            else 0.01
        )
    running_reward = intermediate - penalty

    # Reward always returns terminal_reward on success (rewards.py:36-38);
    # ShapedCustomReward returns 1.0 when unshaped (rewards.py:126-128).
    terminal = 1.0 if (spec.custom and not spec.shaped) else spec.terminal_reward
    reward = jnp.where(lifted, terminal, running_reward)
    status = jnp.where(lifted, SUCCESS, RUNNING).astype(jnp.int32)
    new_rs = RewardState(
        lifting=lifting, start_height=start_h, old_height=jnp.asarray(robot_height)
    )
    return reward, status, new_rs, jnp.asarray(False)


def table_clearing_reward(
    spec: RewardSpec, rs: RewardState, robot_height, detected, lift_dist, num_alive
):
    """ShapedCustomReward with table_clearing (rewards.py:110-131).

    On a lift: the env removes the highest object and reopens the gripper
    (signalled by clear_flag); reward is `lift_success` while objects remain
    and `terminal_reward` + SUCCESS when the last one is cleared.
    `num_alive` is the count *before* removal (get_num_body()==2 check after
    removal == num_alive-1 == 0).
    """
    start_h = jnp.where(rs.lifting, rs.start_height, robot_height)
    lifted = detected & (robot_height - start_h > lift_dist)
    cleared_all = lifted & (num_alive <= 1)

    delta_z = robot_height - rs.old_height
    intermediate = jnp.where(
        detected & spec.shaped, spec.grasp_reward + spec.delta_z_scale * delta_z, 0.0
    )
    penalty = spec.time_penalty if spec.shaped else 0.01
    running_reward = intermediate - penalty

    reward = jnp.where(
        cleared_all,
        spec.terminal_reward,
        jnp.where(lifted, spec.lift_success, running_reward),
    )
    status = jnp.where(cleared_all, SUCCESS, RUNNING).astype(jnp.int32)
    # After a clear the lifting latch resets (gripper reopens).
    new_rs = RewardState(
        lifting=detected & ~lifted,
        start_height=start_h,
        old_height=jnp.asarray(robot_height),
    )
    return reward, status, new_rs, lifted


def simplified_descend(spec: RewardSpec, rs: RewardState, robot_height):
    """SimplifiedReward's movement phase (rewards.py:81-90): FAIL when the
    descent stalls (< 2 mm progress), otherwise keep RUNNING."""
    stalled = (rs.old_height - robot_height < 0.002) & spec.stalled
    reward = jnp.asarray(0.0)
    status = jnp.where(stalled, FAIL, RUNNING).astype(jnp.int32)
    new_rs = rs.replace(old_height=jnp.asarray(robot_height))
    return reward, status, new_rs


def simplified_outcome(detected_after_lift):
    """SimplifiedReward's grasp-attempt verdict (rewards.py:71-80): the env
    has closed the gripper and lifted; success iff the object is still held."""
    reward = jnp.where(detected_after_lift, 1.0, 0.0)
    status = jnp.where(detected_after_lift, SUCCESS, FAIL).astype(jnp.int32)
    return reward, status
