"""HBM-resident replay buffers (uniform + prioritized).

Replaces stable-baselines' host-side ReplayBuffer / PrioritizedReplayBuffer
(used via sb_helper.py:120-173). The buffer is a pytree of device arrays and
insert/sample are pure functions, so the whole collect->store->sample->update
loop stays on-chip.

Memory layout: observations are stored ONCE in a ring (bfloat16 by default —
a 64x64x2 depth obs frame is 16 KB); the "next obs" of transition t is the
frame written one batch-stride later. For terminal transitions that frame
belongs to the auto-reset episode, which is exactly the frame the learner
must NOT bootstrap from — and it doesn't, because targets are masked by
`done`. This halves HBM versus storing (obs, next_obs) pairs.

Prioritized replay (DQN/BDQ, schaul'15): instead of a host-side sum tree
(inherently serial), priorities live in a dense array and sampling uses the
Gumbel-top-k trick over log-priorities — an O(N) parallel argmax-k that maps
cleanly onto the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ReplayBuffer:
    obs: jnp.ndarray        # (C, prod(obs_shape)) storage dtype (flat rows)
    action: jnp.ndarray     # (C, *act_shape)
    reward: jnp.ndarray     # (C,) f32
    done: jnp.ndarray       # (C,) bool
    priority: jnp.ndarray   # (C,) f32 (1.0 when uniform)
    ptr: jnp.ndarray        # () int32 next write slot
    size: jnp.ndarray       # () int32 frames written (saturates at C)
    batch_stride: int = struct.field(pytree_node=False)
    capacity: int = struct.field(pytree_node=False)
    obs_shape: tuple = struct.field(pytree_node=False, default=())


def create(capacity, obs_shape, action_shape, batch_stride,
           obs_dtype=jnp.bfloat16, action_dtype=jnp.float32):
    """capacity is rounded down to a multiple of the per-step insert width.

    Observations are stored FLAT as (C, prod(obs_shape)): with the image
    shape kept, XLA tiles the trailing (64, 2) dims to (8, 128) lanes and
    pads the ring to 2x its logical size (15.3 GiB for 500k frames). A
    8192-wide flat row is lane-aligned with zero padding; sample() restores
    the image shape on the gathered minibatch only.
    """
    capacity = (capacity // batch_stride) * batch_stride
    return ReplayBuffer(
        obs=jnp.zeros((capacity, int(np.prod(obs_shape))), obs_dtype),
        action=jnp.zeros((capacity,) + tuple(action_shape), action_dtype),
        reward=jnp.zeros((capacity,), jnp.float32),
        done=jnp.zeros((capacity,), bool),
        priority=jnp.ones((capacity,), jnp.float32),
        ptr=jnp.asarray(0, jnp.int32),
        size=jnp.asarray(0, jnp.int32),
        batch_stride=batch_stride,
        capacity=capacity,
        obs_shape=tuple(obs_shape),
    )


def insert(buf: ReplayBuffer, obs, action, reward, done):
    """Insert one env-batch of transitions (B = batch_stride rows)."""
    B = buf.batch_stride
    idx = (buf.ptr + jnp.arange(B)) % buf.capacity
    max_p = jnp.max(buf.priority) * (buf.size > 0) + (buf.size == 0) * 1.0
    return buf.replace(
        obs=buf.obs.at[idx].set(obs.reshape(B, -1).astype(buf.obs.dtype)),
        action=buf.action.at[idx].set(action.astype(buf.action.dtype)),
        reward=buf.reward.at[idx].set(reward),
        done=buf.done.at[idx].set(done),
        priority=buf.priority.at[idx].set(max_p),
        ptr=(buf.ptr + B) % buf.capacity,
        size=jnp.minimum(buf.size + B, buf.capacity),
    )


def _valid_range(buf: ReplayBuffer, n_step=1):
    """Sampleable frames: written AND with their n_step successor frames
    written (the most recent batches have no successors yet)."""
    return jnp.maximum(buf.size - n_step * buf.batch_stride, 0)


def _nstep_gather(buf: ReplayBuffer, idx, n_step, gamma):
    """Accumulate n-step returns along the ring (stride = batch_stride).

    reward_n = sum_i gamma^i r_{t+i}, truncated at (and including) the first
    terminal; done_n = episode ended inside the window; next index = t+n.
    Termination inside the window is safe because frames after a terminal
    belong to the auto-reset episode and are gated out by `stop`.
    """
    acc_r = jnp.zeros(idx.shape, jnp.float32)
    stop = jnp.zeros(idx.shape, bool)
    for i in range(n_step):
        idx_i = (idx + i * buf.batch_stride) % buf.capacity
        acc_r = acc_r + (gamma ** i) * buf.reward[idx_i] * (~stop)
        stop = stop | buf.done[idx_i]
    nxt = (idx + n_step * buf.batch_stride) % buf.capacity
    discount = (gamma ** n_step) * (~stop)
    return acc_r, stop, nxt, discount


def sample(buf: ReplayBuffer, key, batch_size, n_step=1, gamma=0.99,
           recent_batch=0, recent_window=0):
    """Uniform sample of (n-step) transitions. Returns dict incl.
    obs/next_obs/reward/done and the bootstrap `discount` (0 when the
    episode terminated inside the window, gamma^n otherwise).

    Recency stratification (`recent_batch` rows drawn uniformly from the
    newest `recent_window` frames instead of the whole ring): under a
    workspace curriculum the ring holds a difficulty mixture spanning the
    whole run, and a large buffer lets stale easy-lambda transitions
    dominate every batch long after the task has moved on — the r4
    flagship decayed sr 0.77 -> 0.35 while parked at lambda=0.875 on a 1M
    ring that was mostly lambda<=0.5 data. Guaranteeing a recent slice
    keeps the learner on the distribution it is actually acting in (the
    off-policy analogue of LFO/combined experience replay, Zhang & Sutton
    2017) without shrinking the buffer's coverage of rare failures."""
    n = _valid_range(buf, n_step)
    # Order slots oldest-first: slot i of the window maps to ring index
    # (ptr - size + i) mod C, which is valid for i < n.
    if recent_batch > 0 and recent_window > 0:
        k_all, k_rec = jax.random.split(key)
        offs_all = jax.random.randint(
            k_all, (batch_size - recent_batch,), 0, jnp.maximum(n, 1)
        )
        lo = jnp.maximum(n - recent_window, 0)
        offs_rec = lo + jax.random.randint(
            k_rec, (recent_batch,), 0, jnp.maximum(n - lo, 1)
        )
        offs = jnp.concatenate([offs_all, offs_rec])
    else:
        offs = jax.random.randint(key, (batch_size,), 0, jnp.maximum(n, 1))
    idx = (buf.ptr - buf.size + offs) % buf.capacity
    reward, done, nxt, discount = _nstep_gather(buf, idx, n_step, gamma)
    img = (batch_size,) + buf.obs_shape
    return dict(
        obs=buf.obs[idx].astype(jnp.float32).reshape(img),
        action=buf.action[idx],
        reward=reward,
        done=done,
        discount=discount,
        next_obs=buf.obs[nxt].astype(jnp.float32).reshape(img),
        idx=idx,
        weight=jnp.ones((batch_size,), jnp.float32),
    )


def sample_prioritized(buf: ReplayBuffer, key, batch_size, alpha=0.6, beta=0.4,
                       n_step=1, gamma=0.99):
    """Proportional prioritized sampling (with replacement) via categorical
    over alpha-scaled log priorities, with importance weights. A dense
    categorical draw is the VPU-friendly equivalent of the host-side sum
    tree."""
    n = _valid_range(buf, n_step)
    slots = jnp.arange(buf.capacity)
    idx_ring = (buf.ptr - buf.size + slots) % buf.capacity
    valid = slots < n
    logits = alpha * jnp.log(jnp.maximum(buf.priority[idx_ring], 1e-12))
    logits = jnp.where(valid, logits, -jnp.inf)
    top = jax.random.categorical(key, logits, shape=(batch_size,))
    idx = idx_ring[top]
    reward, done, nxt, discount = _nstep_gather(buf, idx, n_step, gamma)
    # Importance weights: w = (N * P(i))^-beta / max w
    p = jnp.maximum(buf.priority[idx], 1e-12) ** alpha
    z = jnp.sum(
        jnp.where(valid, jnp.maximum(buf.priority[idx_ring], 1e-12) ** alpha, 0.0)
    )
    probs = p / jnp.maximum(z, 1e-12)
    w = (jnp.maximum(n, 1).astype(jnp.float32) * probs) ** (-beta)
    w = w / jnp.maximum(jnp.max(w), 1e-12)
    img = (batch_size,) + buf.obs_shape
    return dict(
        obs=buf.obs[idx].astype(jnp.float32).reshape(img),
        action=buf.action[idx],
        reward=reward,
        done=done,
        discount=discount,
        next_obs=buf.obs[nxt].astype(jnp.float32).reshape(img),
        idx=idx,
        weight=w,
    )


def update_priorities(buf: ReplayBuffer, idx, td_errors, eps=1e-6):
    return buf.replace(
        priority=buf.priority.at[idx].set(jnp.abs(td_errors) + eps)
    )


def snapshot(buf: ReplayBuffer, rows):
    """Compact checkpoint payload: the newest `rows` frames in ring order.

    The full ring is checkpoint-prohibitive (the flagship's 500k x 8192
    bf16 obs ring is 8 GB through a remote-chip tunnel), but resuming from
    an EMPTY ring mid-run silently degrades learning (the r4 RGB-D run's
    sr decay starts exactly at its mid-run OOM restart — VERDICT r4 weak
    #5). The newest slice is the valuable part: it holds the policy's
    current-difficulty experience, which demo re-seeding cannot replace.

    Returns a dict pytree (jit-friendly); `n` is the count of genuinely
    written rows inside the window (< rows early in a run — the leading
    rows are then unwritten-slot garbage that restore_snapshot excludes
    via `size`).
    """
    rows = int(min(rows, buf.capacity))
    rows -= rows % buf.batch_stride
    idx = (buf.ptr - rows + jnp.arange(rows)) % buf.capacity
    return dict(
        obs=buf.obs[idx],
        action=buf.action[idx],
        reward=buf.reward[idx],
        done=buf.done[idx],
        priority=buf.priority[idx],
        n=jnp.minimum(buf.size, rows).astype(jnp.int32),
        batch_stride=jnp.asarray(buf.batch_stride, jnp.int32),
    )


def restore_snapshot(buf: ReplayBuffer, snap):
    """Rebuild a (fresh) buffer from a snapshot() payload.

    Rows land at slots [0, rows); ptr continues at `rows`, so post-resume
    inserts extend the restored window seamlessly. The final batch_stride
    restored rows are force-marked done: their ring successors are
    post-resume frames from unrelated episodes, and a true `done` makes
    both TD(0) and the n-step gather stop at the seam instead of
    bootstrapping across it (cost: <= one env-batch of rows treated as
    terminal).
    """
    rows = snap["obs"].shape[0]
    if rows > buf.capacity or rows % buf.batch_stride:
        raise ValueError(
            f"ring snapshot ({rows} rows, stride {int(snap['batch_stride'])}) "
            f"incompatible with buffer (capacity {buf.capacity}, stride "
            f"{buf.batch_stride})"
        )
    idx = jnp.arange(rows)
    seam = idx >= rows - buf.batch_stride
    return buf.replace(
        obs=buf.obs.at[idx].set(snap["obs"].astype(buf.obs.dtype)),
        action=buf.action.at[idx].set(snap["action"].astype(buf.action.dtype)),
        reward=buf.reward.at[idx].set(snap["reward"]),
        done=buf.done.at[idx].set(snap["done"] | seam),
        priority=buf.priority.at[idx].set(snap["priority"]),
        ptr=jnp.asarray(rows % buf.capacity, jnp.int32),
        size=snap["n"].astype(jnp.int32),
    )
