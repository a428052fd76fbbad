"""Multi-chip data parallelism over a `jax.sharding.Mesh` via shard_map.

The reference has no parallelism of any kind (one env in a DummyVecEnv,
SURVEY.md §2 parallelism checklist). The TPU-native scale-out axis is the
env batch: each device runs an identical per-shard trainer — its own slice
of envs, its own replay shard in local HBM — and the learner stays
replicated by averaging gradients with `jax.lax.pmean` over the mesh's
'env' axis (ICI collectives inserted by XLA). The curriculum window is
synchronized with `psum` so difficulty advances globally, exactly like the
reference's single shared success deque.

Design notes:
* shard_map (not pjit auto-sharding) because the replay ring-buffer insert
  is a per-shard scatter — under global-view pjit XLA cannot prove the
  scatter stays shard-local and would materialize cross-device traffic.
  With shard_map every buffer op is manifestly local; the ONLY cross-chip
  bytes are gradient/curriculum reductions, which ride ICI.
* Every LoopState leaf carries a leading device axis in the global view
  (explicit replication for params — the standard DP layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from deep_rl_grasping_tpu.training.trainer import Trainer

AXIS = "env"


def make_sharded_trainer(config, mesh: Mesh, run_one_step=False):
    """Build (trainer, init_fn, step_fn) sharded over `mesh`'s 'env' axis.

    Global env batch = config.tpu.num_envs, split evenly across devices.
    Returns jitted functions operating on device-axis-leading pytrees.
    """
    from deep_rl_grasping_tpu.utils import config as cfg_util

    cfg = cfg_util.load_config(config)
    n_dev = mesh.devices.size
    total_envs = int(cfg["tpu"]["num_envs"])
    assert total_envs % n_dev == 0, (
        f"num_envs {total_envs} must divide evenly over {n_dev} devices"
    )
    per_dev = total_envs // n_dev
    algo = cfg.get("algorithm", "SAC").upper()
    trainer = Trainer(cfg, algo=algo, num_envs=per_dev, pmean_axis=AXIS)

    def _init_local(key):
        # key: (1, 2) block -> per-device LoopState with leading axis 1
        state = trainer.init_state(key[0])
        return jax.tree.map(lambda x: x[None], state)

    init_sharded = jax.jit(
        shard_map(
            _init_local,
            mesh=mesh,
            in_specs=(P(AXIS),),
            out_specs=P(AXIS),
            check_vma=False,
        )
    )

    def _step_local(state):
        state = jax.tree.map(lambda x: x[0], state)
        state, metrics = trainer.train_step(state)
        metrics = jax.lax.pmean(metrics, AXIS)
        state = jax.tree.map(lambda x: x[None], state)
        return state, metrics

    step_sharded = jax.jit(
        shard_map(
            _step_local,
            mesh=mesh,
            in_specs=(P(AXIS),),
            out_specs=(P(AXIS), P()),
            check_vma=False,
        ),
        donate_argnums=0,
    )

    def _chunk_local(state, n_steps):
        state = jax.tree.map(lambda x: x[0], state)
        state, metrics = trainer.train_chunk(state, n_steps)
        metrics = jax.lax.pmean(metrics, AXIS)
        state = jax.tree.map(lambda x: x[None], state)
        return state, metrics

    def chunk_sharded(n_steps):
        return jax.jit(
            shard_map(
                functools.partial(_chunk_local, n_steps=n_steps),
                mesh=mesh,
                in_specs=(P(AXIS),),
                out_specs=(P(AXIS), P()),
                check_vma=False,

            ),
            donate_argnums=0,
        )

    def _seed_local(state, n_frames_per_dev):
        # Per-shard demo seeding: each device rolls its own envs with the
        # scripted expert and fills its local replay shard; episode counts
        # are psum'd for the host log. Mirrors Trainer.seed_demos exactly —
        # same program, one copy per shard.
        state = jax.tree.map(lambda x: x[0], state)
        state, nd, ns = trainer.seed_demos(state, n_frames_per_dev)
        nd = jax.lax.psum(nd, AXIS)
        ns = jax.lax.psum(ns, AXIS)
        state = jax.tree.map(lambda x: x[None], state)
        return state, nd, ns

    def seed_sharded(n_frames_total):
        return jax.jit(
            shard_map(
                functools.partial(
                    _seed_local,
                    n_frames_per_dev=max(n_frames_total // n_dev, 1),
                ),
                mesh=mesh,
                in_specs=(P(AXIS),),
                out_specs=(P(AXIS), P(), P()),
                check_vma=False,
            ),
            donate_argnums=0,
        )

    def replicate_tree(tree):
        """Host pytree (no device axis) -> replicated sharded view (leading
        device axis, one identical copy per shard) for warm starts."""
        import numpy as np

        def rep(x):
            x = np.asarray(x)
            arr = np.broadcast_to(x[None], (n_dev,) + x.shape)
            return jax.device_put(arr, NamedSharding(mesh, P(AXIS)))

        return jax.tree.map(rep, tree)

    trainer.seed_sharded = seed_sharded
    trainer.replicate_tree = replicate_tree

    if run_one_step:
        keys = jax.random.split(jax.random.PRNGKey(0), n_dev)
        keys = jax.device_put(keys, NamedSharding(mesh, P(AXIS)))
        state = init_sharded(keys)
        state, metrics = step_sharded(state)
        jax.block_until_ready(metrics)
        return trainer, state, metrics

    return trainer, init_sharded, step_sharded, chunk_sharded
