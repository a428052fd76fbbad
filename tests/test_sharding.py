"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §2
parallelism checklist): the sharded trainer must run, keep learner params
replicated, and synchronize the curriculum globally."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from deep_rl_grasping_tpu.parallel.train_dp import make_sharded_trainer
from deep_rl_grasping_tpu.utils import config as cfg_util

pytestmark = pytest.mark.physics  # heavy tier: real solver/env steps



@pytest.fixture(scope="module")
def small_cfg():
    cfg = cfg_util.load_config("tests/configs/test_continuous.yaml")
    cfg["tpu"]["num_envs"] = 8
    cfg["SAC"] = {
        "batch_size": 8, "buffer_size": 256, "step_size": 3e-4,
        "layers": [16, 16],
    }
    cfg["normalize"] = True
    return cfg


def test_requires_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_step_runs_and_keeps_params_replicated(small_cfg):
    mesh = Mesh(np.array(jax.devices()), axis_names=("env",))
    trainer, state, metrics = make_sharded_trainer(
        small_cfg, mesh, run_one_step=True
    )
    # Metrics must be replicated scalars
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # Learner params carry a leading device axis; all replicas equal after
    # the pmean'd update.
    leaf = jax.tree.leaves(state.algo_state.actor_params)[0]
    leaf = np.asarray(leaf)
    assert leaf.shape[0] == 8
    for d in range(1, 8):
        np.testing.assert_allclose(leaf[0], leaf[d], rtol=1e-5)


def test_curriculum_synchronized_across_devices(small_cfg):
    mesh = Mesh(np.array(jax.devices()), axis_names=("env",))
    trainer, state, _ = make_sharded_trainer(small_cfg, mesh, run_one_step=True)
    lam = np.asarray(state.curriculum.lam)
    ep = np.asarray(state.curriculum.filled)
    assert lam.shape[0] == 8
    assert (lam == lam[0]).all()
    assert (ep == ep[0]).all()


def test_env_states_are_sharded_and_independent(small_cfg):
    mesh = Mesh(np.array(jax.devices()), axis_names=("env",))
    trainer, state, _ = make_sharded_trainer(small_cfg, mesh, run_one_step=True)
    # per-device env slices: (8 devices, 1 env/device, ...) gripper states
    q = np.asarray(state.env_states.sim.gripper.q)
    assert q.shape[:2] == (8, 1)
    keys = np.asarray(state.key)
    # rng streams must differ across devices
    assert len({tuple(k) for k in keys.reshape(8, -1)}) == 8
