"""Action decoding: spaces, denormalization, clipping, discrete tables.

Pure-function port of the reference Actuator (gripperEnv/actuator.py:6-154):

* Continuous full env:   Box(-1,1,(5,)) = (dx, dy, dz, dyaw, open/close)
* Continuous simplified: Box(-1,1,(3,)) = (dx, dy, dyaw), constant -5 mm dz
* Discrete full:         Discrete(11) lookup table (actuator.py:106-115)
* Discrete simplified:   Discrete(3 * num_actions_pad) per-branch linear bins
                         (BDQ action pads, actuator.py:126-147)

The reference denormalizes with a sklearn MinMaxScaler fit on (-high, high)
with feature_range (-1,1) (actuator.py:54-78); inverse_transform of that
scaler is exactly `action * high`, which is what we compute.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

# Gripper command encoding for the env step
CMD_MOVE = 0
CMD_OPEN = 1
CMD_CLOSE = 2


@dataclass(frozen=True)
class ActuatorSpec:
    simplified: bool
    discrete: bool
    max_translation: float
    max_yaw_rotation: float
    discrete_step: float
    yaw_step: float
    num_actions_pad: int
    include_robot_height: bool

    @classmethod
    def from_config(cls, config):
        r = config["robot"]
        return cls(
            simplified=bool(config["simplified"]),
            discrete=bool(r["discrete"]),
            max_translation=float(r["max_translation"]),
            max_yaw_rotation=float(r["max_yaw_rotation"]),
            discrete_step=float(r["step_size"]),
            yaw_step=float(r["yaw_step"]),
            num_actions_pad=int(r.get("num_actions_pad", 2)),
            include_robot_height=bool(r.get("include_robot_height", False)),
        )

    @property
    def action_dim(self):
        if self.discrete:
            return 1
        return 3 if self.simplified else 5

    @property
    def num_discrete_actions(self):
        if self.simplified:
            return 3 * self.num_actions_pad
        return 11


def _clip_translation(translation, yaw, max_translation, max_yaw):
    """Norm-clip the translation; positive-side clamp on yaw
    (actuator.py:91-98 only rescales when yaw > max — replicated)."""
    length = jnp.linalg.norm(translation)
    scale = jnp.where(length > max_translation, max_translation / jnp.maximum(length, 1e-9), 1.0)
    translation = translation * scale
    yaw = jnp.where(yaw > max_yaw, max_yaw, yaw)
    return translation, yaw


def _full_discrete_tables(spec: ActuatorSpec):
    s, y = spec.discrete_step, spec.yaw_step
    x = np.array([0, s, -s, 0, 0, 0, 0, 0, 0, 0, 0], np.float32)
    yy = np.array([0, 0, 0, s, -s, 0, 0, 0, 0, 0, 0], np.float32)
    z = np.array([0, 0, 0, 0, 0, s, -s, 0, 0, 0, 0], np.float32)
    a = np.array([0, 0, 0, 0, 0, 0, 0, y, -y, 0, 0], np.float32)
    oc = np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, s, -s], np.float32)
    return jnp.asarray(np.stack([x, yy, z, a, oc], 1))  # (11, 5)


def decode_action(spec: ActuatorSpec, action, gripper_close):
    """Map a raw policy action to (translation (3,), yaw_rotation, command).

    `gripper_close` is the latched open/close state (True = currently closed,
    the inverse of the reference's `_gripper_open`). The command follows
    actuator.py:116-123: open requests are ignored while open, close requests
    ignored while closed, and a gripper toggle *replaces* the move.
    """
    mt, my = spec.max_translation, spec.max_yaw_rotation
    if spec.simplified:
        if spec.discrete:
            a = jnp.asarray(action, jnp.int32)
            pads = spec.num_actions_pad
            grains = pads - 1
            branch = a // pads
            idx = (a % pads).astype(jnp.float32)
            t_val = idx / grains * (2 * mt) - mt
            y_val = idx / grains * (2 * my) - my
            tx = jnp.where(branch == 0, t_val, 0.0)
            ty = jnp.where(branch == 1, t_val, 0.0)
            yaw = jnp.where(branch == 2, y_val, 0.0)
        else:
            a = jnp.asarray(action, jnp.float32)
            high = jnp.array([mt, mt, my], jnp.float32)
            a = a * high
            t2, yaw = _clip_translation(a[:2], a[2], mt, my)
            tx, ty = t2[0], t2[1]
        # Constant descent (actuator.py:148-149)
        translation = jnp.stack([tx, ty, jnp.asarray(0.005, jnp.float32)])
        return translation, yaw, jnp.asarray(CMD_MOVE, jnp.int32)

    if spec.discrete:
        a = jnp.asarray(action, jnp.int32)
        row = _full_discrete_tables(spec)[a]
        translation = row[:3]
        yaw = row[3]
        open_close = row[4]
    else:
        a = jnp.asarray(action, jnp.float32)
        high = jnp.array([mt, mt, mt, my, 1.0], jnp.float32)
        a = a * high
        translation, yaw = _clip_translation(a[:3], a[3], mt, my)
        open_close = a[4]

    cmd = jnp.where(
        (open_close > 0.0) & gripper_close,
        CMD_OPEN,
        jnp.where((open_close < 0.0) & ~gripper_close, CMD_CLOSE, CMD_MOVE),
    ).astype(jnp.int32)
    return translation, yaw, cmd


def decode_branched_action(spec: ActuatorSpec, bins):
    """BDQ composite action: one bin per action dimension, applied jointly
    (the bdq_sb fork's action interface; bins use the same per-branch linear
    discretization as actuator.py:126-147).

    Simplified env: bins (3,) = (dx, dy, dyaw). Full env: bins (5,) =
    (dx, dy, dz, dyaw, open/close with the middle bin = no-op).
    """
    mt, my = spec.max_translation, spec.max_yaw_rotation
    grains = spec.num_actions_pad - 1
    f = bins.astype(jnp.float32) / grains  # in [0, 1]
    if spec.simplified:
        tx = f[0] * 2 * mt - mt
        ty = f[1] * 2 * mt - mt
        yaw = f[2] * 2 * my - my
        translation = jnp.stack([tx, ty, jnp.asarray(0.005, jnp.float32)])
        return translation, yaw, jnp.asarray(CMD_MOVE, jnp.int32)
    t = f[:3] * 2 * mt - mt
    yaw = f[3] * 2 * my - my
    oc = f[4] * 2.0 - 1.0
    cmd = jnp.where(oc > 1e-6, CMD_OPEN, jnp.where(oc < -1e-6, CMD_CLOSE, CMD_MOVE))
    return t, yaw, cmd.astype(jnp.int32)


def actuator_obs(spec: ActuatorSpec, width, height):
    """Opening-width observation scaled to [0,1] (actuator.py:43-52)."""
    if spec.include_robot_height:
        return jnp.stack([width / 0.05, height])
    return jnp.asarray(width / 0.1)[None]
