"""Every shipped training config must build its Trainer and trace its full
train step.

The chip queue (scripts_dev/run_queue.sh) launches these configs unattended
through the one-process TPU tunnel; a config typo or wiring bug costs a whole
tunnel window. Tracing with jax.eval_shape catches shape/dtype/key errors in
env construction, network init, replay layout, and the update loop without
compiling or allocating (the flagship replay ring alone would be ~16 GB
concrete).
"""

import os

import jax
import pytest

from deep_rl_grasping_tpu.training.trainer import Trainer
from deep_rl_grasping_tpu.utils import config as cfg_util

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (config file, algo) — the algo train.py / run_queue.sh passes for it.
CONFIGS = [
    ("gripper_grasp.yaml", "SAC"),
    ("sac_full_flagship.yaml", "SAC"),
    ("sac_encoder_flagship.yaml", "SAC"),
    ("sac_rgbd_flagship.yaml", "SAC"),
    ("sac_table_clearing.yaml", "SAC"),
    ("sac_depth_long.yaml", "SAC"),
    ("sac_simplified_demo.yaml", "SAC"),
    ("sac_simplified_depth_demo.yaml", "SAC"),
    ("sac_simplified_sharded.yaml", "SAC"),
    ("simplified_object_picking.yaml", "SAC"),
    ("bdq_simplified.yaml", "BDQ"),
    ("dqn_simplified.yaml", "DQN"),
    ("ddpg_simplified.yaml", "DDPG"),
    ("sac_simplified_sharded_quality.yaml", "SAC"),
    ("sac_simplified_singlechip_quality.yaml", "SAC"),
    ("sac_simplified_batched_quality.yaml", "SAC"),
]

# On-policy configs go through OnPolicyTrainer (rollout + GAE update).
ONPOLICY_CONFIGS = [
    ("ppo_simplified.yaml", "PPO"),
    ("trpo_simplified.yaml", "TRPO"),
]


@pytest.mark.parametrize(
    "name,algo", ONPOLICY_CONFIGS, ids=[c for c, _ in ONPOLICY_CONFIGS]
)
def test_onpolicy_config_builds_and_train_step_traces(name, algo):
    from deep_rl_grasping_tpu.training.onpolicy import OnPolicyTrainer

    config = cfg_util.load_config(os.path.join(REPO, "configs", name))
    config["robot"]["discrete"] = False
    config["algorithm"] = algo.lower()
    config.setdefault(algo, {})["n_steps"] = 4
    tpu = config.setdefault("tpu", {})
    tpu["num_envs"] = 4

    trainer = OnPolicyTrainer(config, algo=algo)
    state = jax.eval_shape(trainer.init_state, jax.random.PRNGKey(0))
    new_state, metrics = jax.eval_shape(trainer.train_iteration, state)
    assert jax.tree_util.tree_structure(new_state) == (
        jax.tree_util.tree_structure(state)
    )


@pytest.mark.parametrize("name,algo", CONFIGS, ids=[c for c, _ in CONFIGS])
def test_config_builds_and_train_step_traces(name, algo):
    config = cfg_util.load_config(os.path.join(REPO, "configs", name))
    # the mutations train.py main() applies before Trainer construction
    # (train.py:89-90)
    config["robot"]["discrete"] = algo in ("DQN", "BDQ")
    config["algorithm"] = algo.lower()
    # tiny replay/batch so abstract shapes stay small; wiring is unchanged
    config.setdefault(algo, {})["buffer_size"] = 512
    config[algo]["batch_size"] = 8
    tpu = config.setdefault("tpu", {})
    tpu["num_envs"] = 4
    if tpu.get("demo_frames"):
        tpu["demo_frames"] = 64

    trainer = Trainer(config, algo=algo)
    state = jax.eval_shape(trainer.init_state, jax.random.PRNGKey(0))
    out = jax.eval_shape(trainer.train_step, state)
    new_state, metrics = out
    # the traced step must preserve the loop-state structure exactly
    # (train.py's host loop feeds it straight back in)
    assert jax.tree_util.tree_structure(new_state) == (
        jax.tree_util.tree_structure(state)
    )
    assert all(
        a.shape == b.shape and a.dtype == b.dtype
        for a, b in zip(jax.tree_util.tree_leaves(new_state),
                        jax.tree_util.tree_leaves(state))
    )
    assert "loss" in str(metrics) or isinstance(metrics, dict)
