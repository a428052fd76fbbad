"""Algorithm sanity tests: shapes, finiteness, and that each learner can fit
a trivial problem (reward identifiable from obs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_rl_grasping_tpu.algos.bdq import BDQ
from deep_rl_grasping_tpu.algos.ddpg import DDPG
from deep_rl_grasping_tpu.algos.dqn import DQN
from deep_rl_grasping_tpu.algos.ppo import PPO
from deep_rl_grasping_tpu.algos.sac import SAC
from deep_rl_grasping_tpu.algos.trpo import TRPO

CFG = {
    "discount_factor": 0.9,
    "SAC": {"batch_size": 32, "layers": [32, 32], "step_size": 3e-3},
    "DQN": {"batch_size": 32, "learning_rate": 1e-3},
    "BDQ": {"batch_size": 32, "num_actions_pad": 5, "layers": [[32, 32], [16], [16]]},
    "PPO": {"n_steps": 8, "learning_rate": 1e-3},
    "TRPO": {"n_steps": 8},
    "DDPG": {"batch_size": 32},
}
OBS = (4,)


def _batch(key, action_shape, action_dtype=jnp.float32, n=32):
    ks = jax.random.split(key, 4)
    obs = jax.random.normal(ks[0], (n,) + OBS)
    if action_dtype == jnp.int32:
        action = jax.random.randint(ks[1], (n,) + action_shape, 0, 3)
    else:
        action = jax.random.uniform(ks[1], (n,) + action_shape, minval=-1, maxval=1)
    return dict(
        obs=obs,
        action=action,
        # reward depends only on obs[0] -> learnable value structure
        reward=obs[:, 0],
        next_obs=jax.random.normal(ks[2], (n,) + OBS),
        done=jax.random.bernoulli(ks[3], 0.2, (n,)),
        weight=jnp.ones((n,)),
        idx=jnp.arange(n),
    )


def test_sac_update_runs_and_losses_finite():
    sac = SAC(OBS, 2, CFG)
    state = sac.init(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1), (2,))
    update = jax.jit(sac.update)
    for i in range(10):
        state, metrics, td = update(state, batch, jax.random.PRNGKey(i))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    a = sac.act(state.actor_params, batch["obs"], jax.random.PRNGKey(2))
    assert a.shape == (32, 2)
    assert np.all(np.abs(np.asarray(a)) <= 1.0)


def test_sac_critic_learns_reward():
    sac = SAC(OBS, 2, CFG)
    state = sac.init(jax.random.PRNGKey(0))
    update = jax.jit(sac.update)
    key = jax.random.PRNGKey(1)
    for i in range(200):
        key, k = jax.random.split(key)
        batch = _batch(k, (2,))
        batch["done"] = jnp.ones((32,), bool)  # pure reward regression
        state, metrics, _ = update(state, batch, k)
    assert float(metrics["critic_loss"]) < 0.5


def test_sac_bc_term_clones_demo_actions():
    """Q-filtered BC (SAC.bc_weight): with every row marked is_demo and a
    fixed demo action, repeated updates must pull tanh(mean) toward the demo
    action much faster than plain SAC would drift there."""
    cfg = dict(CFG)
    cfg["SAC"] = dict(CFG["SAC"], bc_weight=5.0)
    sac = SAC(OBS, 2, cfg)
    assert sac.bc_weight == 5.0
    state = sac.init(jax.random.PRNGKey(0))
    update = jax.jit(sac.update)
    demo_a = jnp.tile(jnp.asarray([[0.7, -0.5]]), (32, 1))
    key = jax.random.PRNGKey(3)
    for i in range(150):
        key, k = jax.random.split(key)
        batch = _batch(k, (2,))
        batch["action"] = demo_a
        batch["reward"] = jnp.ones((32,))  # demo actions rate well
        batch["is_demo"] = jnp.ones((32,), bool)
        state, metrics, _ = update(state, batch, k)
    mean, _ = sac.actor.apply(
        {"params": state.actor_params}, batch["obs"]
    )
    err = float(jnp.abs(jnp.tanh(mean) - demo_a).mean())
    assert err < 0.25, f"BC did not clone demo actions (mean |err| {err:.3f})"
    assert np.isfinite(float(metrics["bc_loss"]))


def test_sac_bc_ignored_without_flag():
    """A batch without is_demo must take the plain actor-loss path even when
    bc_weight is configured (other callers: eval, tests, bench)."""
    cfg = dict(CFG)
    cfg["SAC"] = dict(CFG["SAC"], bc_weight=5.0)
    sac = SAC(OBS, 2, cfg)
    state = sac.init(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1), (2,))
    state, metrics, _ = jax.jit(sac.update)(state, batch, jax.random.PRNGKey(2))
    assert float(metrics["bc_loss"]) == 0.0


def test_dqn_update_and_act():
    dqn = DQN(OBS, 4, CFG)
    state = dqn.init(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1), (), jnp.int32)
    update = jax.jit(dqn.update)
    for i in range(5):
        state, metrics, td = update(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    acts = dqn.act(state.params, batch["obs"], jax.random.PRNGKey(2), 0.5)
    assert acts.shape == (32,)
    assert np.all((np.asarray(acts) >= 0) & (np.asarray(acts) < 4))


def test_dqn_epsilon_schedule():
    dqn = DQN(OBS, 4, CFG)
    assert float(dqn.epsilon(0)) == pytest.approx(1.0)
    assert float(dqn.epsilon(10**9)) == pytest.approx(dqn.exploration_final_eps)


def test_bdq_update_and_act():
    bdq = BDQ(OBS, 3, CFG)
    state = bdq.init(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1), (3,), jnp.int32)
    update = jax.jit(bdq.update)
    for i in range(5):
        state, metrics, td = update(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    acts = bdq.act(state.params, batch["obs"], jax.random.PRNGKey(2), 0.3)
    assert acts.shape == (32, 3)
    assert np.all(np.asarray(acts) < bdq.num_actions_pad)


def test_bdq_q_shape():
    bdq = BDQ(OBS, 3, CFG)
    state = bdq.init(jax.random.PRNGKey(0))
    q = bdq.net.apply({"params": state.params}, jnp.zeros((7,) + OBS))
    assert q.shape == (7, 3, bdq.num_actions_pad)
    # dueling: per-branch advantages are mean-centered around V
    adv_mean = (q - q.mean(-1, keepdims=True)).mean()
    assert abs(float(adv_mean)) < 1e-5


def test_ddpg_update():
    ddpg = DDPG(OBS, 2, CFG)
    state = ddpg.init(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1), (2,))
    update = jax.jit(ddpg.update)
    for i in range(5):
        state, metrics, td = update(state, batch)
    assert np.isfinite(float(metrics["critic_loss"]))


def test_ppo_gae_and_update():
    ppo = PPO(OBS, 2, CFG)
    state = ppo.init(jax.random.PRNGKey(0))
    T, B = 8, 4
    rewards = jnp.ones((T, B))
    values = jnp.zeros((T, B))
    dones = jnp.zeros((T, B), bool)
    adv, ret = ppo.gae(rewards, values, dones, jnp.zeros(B))
    # with v=0, returns = discounted sums; first-step return biggest
    assert float(ret[0, 0]) > float(ret[-1, 0])
    key = jax.random.PRNGKey(1)
    obs = jax.random.normal(key, (T * B,) + OBS)
    action, logp, value = ppo.act(state.params, obs, key)
    batch = dict(
        obs=obs, action=action, logp=logp, value=value,
        advantage=jnp.ones(T * B), **{"return": ret.reshape(-1)},
    )
    state2, metrics = jax.jit(ppo.update)(state, batch, key)
    assert np.isfinite(float(metrics["loss"]))


def test_ppo_discrete():
    ppo = PPO(OBS, 5, CFG, discrete=True)
    state = ppo.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (16,) + OBS)
    action, logp, value = ppo.act(state.params, obs, jax.random.PRNGKey(2))
    assert action.dtype == jnp.int32
    assert np.all((np.asarray(action) >= 0) & (np.asarray(action) < 5))


def test_trpo_update_respects_kl():
    trpo = TRPO(OBS, 2, CFG)
    state = trpo.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    obs = jax.random.normal(key, (64,) + OBS)
    action, logp, value = trpo.act(state.params, obs, key)
    batch = dict(
        obs=obs, action=action, logp=logp, value=value,
        advantage=jax.random.normal(key, (64,)),
        **{"return": jax.random.normal(key, (64,))},
    )
    state2, metrics = jax.jit(trpo.update)(state, batch, key)
    assert float(metrics["kl"]) <= trpo.max_kl * 1.5 + 1e-4
    assert np.isfinite(float(metrics["vf_loss"]))
