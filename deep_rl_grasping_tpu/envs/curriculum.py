"""Workspace curriculum as a device-resident state machine.

Port of WorkspaceCurriculum (gripperEnv/curriculum.py:11-84): difficulty
lambda in [0,1] interpolates extent / spawn height / object counts / lift
distance; when the success rate over the last `window_size` episodes exceeds
`success_threshold`, lambda increases by 1/n_steps and the window clears.

The reference tracks a deque over single-env episodes; with thousands of
parallel envs the window is a shared (success_count, episode_count) pair
updated with batch sums each step — same statistic, batch-aggregated.
Evaluation forces lambda = 1 (curriculum.py:33).

Reference quirk NOT replicated: curriculum.py:61-62 computes min_objects
from the max_objects range (a copy-paste bug); we interpolate the
min_objects range as configured. With the default min_objects [1,1] the
two are identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
from flax import struct


def _convert(lam, rng):
    """Map lambda in [0,1] to the configured [min, max] (curriculum.py:81-84)."""
    return rng[0] + (rng[1] - rng[0]) * lam


@dataclass(frozen=True)
class CurriculumSpec:
    n_steps: int
    success_threshold: float
    window_size: int
    init_lambda: float
    extent: tuple
    robot_height: tuple
    max_objects: tuple
    min_objects: tuple
    lift_dist: tuple  # may be None -> fixed default

    @classmethod
    def from_config(cls, config):
        c = config["curriculum"]
        return cls(
            n_steps=int(c["n_steps"]),
            success_threshold=float(c["success_threshold"]),
            window_size=int(c["window_size"]),
            init_lambda=float(c.get("init_lambda", 0.0)),
            extent=tuple(c["extent"]),
            robot_height=tuple(c["robot_height"]),
            max_objects=tuple(c["max_objects"]),
            min_objects=tuple(c.get("min_objects", [1, 1])),
            lift_dist=tuple(c["lift_dist"]) if c.get("lift_dist") else None,
        )


@struct.dataclass
class CurriculumState:
    lam: jnp.ndarray            # ()
    success_count: jnp.ndarray  # () int32, successes in current window
    episode_count: jnp.ndarray  # () int32, episodes in current window
    sr_mean: jnp.ndarray        # () rolling success rate (for logging)
    policy_iteration: jnp.ndarray  # () int32, lambda increments so far

    @classmethod
    def init(cls, spec: CurriculumSpec, evaluate=False):
        return cls(
            lam=jnp.asarray(1.0 if evaluate else spec.init_lambda, jnp.float32),
            success_count=jnp.asarray(0, jnp.int32),
            episode_count=jnp.asarray(0, jnp.int32),
            sr_mean=jnp.asarray(0.0, jnp.float32),
            policy_iteration=jnp.asarray(1, jnp.int32),
        )


def params_at(spec: CurriculumSpec, lam):
    """Interpolated task parameters at difficulty lambda
    (curriculum.py:57-78)."""
    extent = _convert(lam, spec.extent)
    height = _convert(lam, spec.robot_height)
    max_objects = jnp.round(_convert(lam, spec.max_objects)).astype(jnp.int32)
    min_objects = jnp.round(_convert(lam, spec.min_objects)).astype(jnp.int32)
    if spec.lift_dist is not None:
        lift_dist = _convert(lam, spec.lift_dist)
    else:
        lift_dist = jnp.asarray(0.1, jnp.float32)
    return dict(
        extent=extent,
        robot_height=height,
        max_objects=max_objects,
        min_objects=min_objects,
        lift_dist=lift_dist,
    )


def update(spec: CurriculumSpec, state: CurriculumState, n_done, n_success):
    """Fold a batch of episode outcomes into the window; advance lambda when
    the window is full and the success rate clears the threshold
    (curriculum.py:38-49)."""
    ep = state.episode_count + n_done
    sc = state.success_count + n_success
    window_full = ep >= spec.window_size
    rate = sc / jnp.maximum(ep, 1)
    advance = window_full & (rate > spec.success_threshold) & (state.lam < 1.0)
    new_lam = jnp.where(
        advance, jnp.minimum(1.0, state.lam + 1.0 / spec.n_steps), state.lam
    )
    # The reference clears history only when lambda advances; a full window
    # that misses the threshold keeps sliding (deque maxlen). We approximate
    # the sliding window by halving the counts when full without advancing.
    ep_next = jnp.where(advance, 0, jnp.where(window_full, ep // 2, ep))
    sc_next = jnp.where(advance, 0, jnp.where(window_full, sc // 2, sc))
    return state.replace(
        lam=new_lam,
        episode_count=ep_next.astype(jnp.int32),
        success_count=sc_next.astype(jnp.int32),
        sr_mean=rate,
        policy_iteration=state.policy_iteration + advance.astype(jnp.int32),
    )
