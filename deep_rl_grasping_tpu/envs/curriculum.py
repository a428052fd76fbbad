"""Workspace curriculum as a device-resident state machine.

Port of WorkspaceCurriculum (gripperEnv/curriculum.py:11-84): difficulty
lambda in [0,1] interpolates extent / spawn height / object counts / lift
distance; when the success rate over the last `window_size` episodes exceeds
`success_threshold`, lambda increases by 1/n_steps and the window clears.

The reference tracks a deque over single-env episodes; here the deque is a
device-resident ring buffer of the last `window_size` episode outcomes,
scattered into by however many episodes finish in each batched step — the
exact same sliding-window statistic. Evaluation forces lambda = 1
(curriculum.py:33).

Reference quirk replicated (curriculum.py:61-62): min_objects is computed
from the max_objects range, so exactly round(convert(lam, max_objects))
objects spawn. Round-1 code interpolated the configured min_objects range
instead ("the two are identical" was wrong — they only agree at lam where
the ranges cross); the sparser scenes starved early exploration of grasp
successes. See params_at.
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
    ring: jnp.ndarray           # (window_size,) f32 episode outcomes
    ptr: jnp.ndarray            # () int32 next ring slot
    filled: jnp.ndarray         # () int32 episodes in window (<= W)
    sr_mean: jnp.ndarray        # () rolling success rate (for logging)
    policy_iteration: jnp.ndarray  # () int32, lambda increments so far

    @classmethod
    def init(cls, spec: CurriculumSpec, evaluate=False):
        return cls(
            lam=jnp.asarray(1.0 if evaluate else spec.init_lambda, jnp.float32),
            ring=jnp.zeros((spec.window_size,), jnp.float32),
            ptr=jnp.asarray(0, jnp.int32),
            filled=jnp.asarray(0, jnp.int32),
            sr_mean=jnp.asarray(0.0, jnp.float32),
            policy_iteration=jnp.asarray(1, jnp.int32),
        )


def params_at(spec: CurriculumSpec, lam):
    """Interpolated task parameters at difficulty lambda
    (curriculum.py:57-78)."""
    extent = _convert(lam, spec.extent)
    height = _convert(lam, spec.robot_height)
    max_objects = jnp.round(_convert(lam, spec.max_objects)).astype(jnp.int32)
    # Reference quirk REPLICATED deliberately (curriculum.py:61-62):
    # min_objects is interpolated from the max_objects range too, so the
    # scene always spawns exactly round(convert(lam, max_objects)) objects
    # (3 at lam=0). This is load-bearing: 3 objects inside the +-1 cm spawn
    # extent give an untrained policy a ~3x higher grasp-success floor than
    # 1-3 objects, which is what lets SAC bootstrap off random successes.
    min_objects = jnp.round(_convert(lam, spec.max_objects)).astype(jnp.int32)
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


def update(spec: CurriculumSpec, state: CurriculumState, done_mask, success_mask):
    """Scatter a batch of finished episodes into the sliding window ring
    and advance lambda when the full window clears the threshold.

    Exact deque(maxlen=window_size) semantics (curriculum.py:38-49): the
    ring holds the last `window_size` episode outcomes; a full window that
    misses the threshold keeps sliding; history clears only when lambda
    advances. `done_mask`/`success_mask` are per-episode-slot booleans
    (any shape; flattened) — each True `done` writes one outcome.
    """
    W = spec.window_size
    done = done_mask.reshape(-1)
    succ = success_mask.reshape(-1).astype(jnp.float32)
    d32 = done.astype(jnp.int32)
    # Ring slots for this batch's finished episodes, in-batch order.
    offset = jnp.cumsum(d32) - d32
    pos = (state.ptr + offset) % W
    n_new = d32.sum()
    # If more episodes finish in one update than the window holds (possible
    # in the sharded path: all-gathered lanes can exceed W), duplicate
    # scatter indices would resolve in unspecified order — keep only the
    # LAST W done lanes so the ring still holds the most recent outcomes.
    keep = done & (offset >= n_new - W)
    # Non-kept lanes scatter out of range and are dropped.
    pos = jnp.where(keep, pos, W)
    ring = state.ring.at[pos].set(succ, mode="drop")
    ptr = (state.ptr + n_new) % W
    filled = jnp.minimum(state.filled + n_new, W)

    window_full = filled >= W
    rate = ring.sum() / jnp.maximum(filled, 1).astype(jnp.float32)
    advance = window_full & (rate > spec.success_threshold) & (state.lam < 1.0)
    new_lam = jnp.where(
        advance, jnp.minimum(1.0, state.lam + 1.0 / spec.n_steps), state.lam
    )
    clear = advance
    return state.replace(
        lam=new_lam,
        ring=jnp.where(clear, jnp.zeros_like(ring), ring),
        ptr=jnp.where(clear, 0, ptr).astype(jnp.int32),
        filled=jnp.where(clear, 0, filled).astype(jnp.int32),
        sr_mean=rate,
        policy_iteration=state.policy_iteration + advance.astype(jnp.int32),
    )
