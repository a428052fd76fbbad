"""End-to-end training-loop tests: off-policy (SAC/DQN/BDQ/DDPG) and
on-policy (PPO/TRPO) trainers step the real env, fill buffers, update
learners, and checkpoints round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_rl_grasping_tpu.training.trainer import Trainer
from deep_rl_grasping_tpu.training.onpolicy import OnPolicyTrainer
from deep_rl_grasping_tpu.utils import config as cfg_util

pytestmark = pytest.mark.physics  # heavy tier: real solver/env steps



def _cfg(simplified=False, discrete=False, **algo_blocks):
    path = (
        "tests/configs/test_simplified_cont.yaml"
        if simplified
        else "tests/configs/test_continuous.yaml"
    )
    cfg = cfg_util.load_config(path)
    cfg["tpu"]["num_envs"] = 4
    cfg["robot"]["discrete"] = discrete
    cfg["normalize"] = True
    cfg.update(algo_blocks)
    return cfg


@pytest.mark.parametrize("algo,discrete", [("SAC", False), ("DDPG", False)])
def test_offpolicy_continuous_trainers(algo, discrete):
    cfg = _cfg(
        SAC={"batch_size": 8, "buffer_size": 128, "layers": [16, 16]},
        DDPG={"batch_size": 8, "buffer_size": 128},
    )
    cfg[algo]["buffer_size"] = 128
    tr = Trainer(cfg, algo=algo)
    tr.learning_starts = 8
    state = jax.jit(tr.init_state)(jax.random.PRNGKey(0))
    step = jax.jit(tr.train_step)
    for _ in range(4):
        state, metrics = step(state)
    assert int(state.buffer.size) == 16
    assert int(state.global_step) == 16
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_sac_demo_buffer_and_bc_wiring():
    """SACfD wiring: tpu.demo_fraction creates the protected demo ring,
    seed_demos fills it, and train_step draws mixed batches with the BC term
    active (bc_loss metric present and finite)."""
    cfg = _cfg(SAC={"batch_size": 8, "buffer_size": 128, "layers": [16, 16],
                    "bc_weight": 1.0})
    cfg["tpu"]["demo_frames"] = 64
    cfg["tpu"]["demo_fraction"] = 0.25
    tr = Trainer(cfg, algo="SAC")
    tr.learning_starts = 8
    assert tr.demo_batch == 2
    state = jax.jit(tr.init_state)(jax.random.PRNGKey(0))
    assert state.demo_buffer is not None
    assert state.demo_buffer.capacity == 64
    state, nd, ns = jax.jit(lambda s: tr.seed_demos(s, 32))(state)
    assert int(state.demo_buffer.size) == 32
    assert int(state.buffer.size) == 32  # demos also land in the main ring
    step = jax.jit(tr.train_step)
    for _ in range(4):
        state, metrics = step(state)
    assert np.isfinite(float(metrics["bc_loss"]))
    assert int(state.demo_buffer.size) == 32  # policy data never overwrites


def test_dqn_trainer_discrete():
    cfg = _cfg(discrete=True, DQN={"batch_size": 8, "buffer_size": 128,
                                   "prioritized_replay": True})
    tr = Trainer(cfg, algo="DQN")
    tr.learning_starts = 8
    state = jax.jit(tr.init_state)(jax.random.PRNGKey(0))
    step = jax.jit(tr.train_step)
    for _ in range(4):
        state, metrics = step(state)
    assert np.isfinite(float(metrics["loss"]))
    # priorities were touched by updates
    assert float(jnp.max(state.buffer.priority)) > 0


def test_bdq_trainer_simplified():
    cfg = _cfg(simplified=True, BDQ={
        "batch_size": 8, "buffer_size": 128, "num_actions_pad": 5,
        "layers": [[16, 16], [8], [8]], "learning_starts": 8,
    })
    tr = Trainer(cfg, algo="BDQ")
    tr.learning_starts = 8
    state = jax.jit(tr.init_state)(jax.random.PRNGKey(0))
    step = jax.jit(tr.train_step)
    for _ in range(3):
        state, metrics = step(state)
    assert np.isfinite(float(metrics["loss"]))
    # branched actions stored as (B, 3) bins
    assert state.buffer.action.shape[-1] == 3

    # Regression (r3 BDQ run): the fresh eval env must inherit the
    # BDQ-overridden actuator pad count, or deterministic eval decodes
    # every action with the wrong bins (train sr 0.89 / eval 0.0).
    res = tr.evaluate(state.algo_state, state.normalizer, n_episodes=2)
    assert (tr._last_eval_env.actuator_spec.num_actions_pad
            == tr.env.actuator_spec.num_actions_pad == 5)
    assert tr._last_eval_env.branched_actions
    assert float(res["episodes"]) >= 1.0


def test_evaluate_at_training_lambda():
    """evaluate(lam=...) runs the protocol scenes at the given curriculum
    lambda (VERDICT r3 weak #4: an eval pinned to lambda=1 is uninformative
    while training is still ramping) and reuses the same jit cache entry
    (lam is traced, not baked into the compile)."""
    cfg = _cfg(SAC={"batch_size": 8, "buffer_size": 128, "layers": [16, 16]})
    tr = Trainer(cfg, algo="SAC")
    state = jax.jit(tr.init_state)(jax.random.PRNGKey(0))
    res_full = tr.evaluate(state.algo_state, state.normalizer, n_episodes=2)
    res_easy = tr.evaluate(
        state.algo_state, state.normalizer, n_episodes=2, lam=0.0
    )
    assert float(res_full["episodes"]) >= 1.0
    assert float(res_easy["episodes"]) >= 1.0
    # one compile, two lambdas
    run, n_calls = tr._eval_cache[(2, True, False)]
    assert n_calls == 2
    # Cleared-objects-per-episode metric (VERDICT r3 #3): present in every
    # eval dict; zero in non-clearing tasks (objects are never removed).
    assert float(res_full["mean_cleared"]) == 0.0
    assert float(res_easy["mean_cleared"]) == 0.0


@pytest.mark.parametrize("algo", ["PPO", "TRPO"])
def test_onpolicy_trainers(algo):
    cfg = _cfg(
        PPO={"n_steps": 4, "n_epochs": 2, "n_minibatches": 2, "layers": [16, 16]},
        TRPO={"n_steps": 4, "cg_iters": 4, "vf_iters": 1},
    )
    tr = OnPolicyTrainer(cfg, algo=algo)
    state = jax.jit(tr.init_state)(jax.random.PRNGKey(0))
    step = jax.jit(tr.train_iteration)
    state, metrics = step(state)
    state, metrics = step(state)
    assert int(state.global_step) == 2 * 4 * 4
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_checkpoint_roundtrip(tmp_path):
    from deep_rl_grasping_tpu.training.callbacks import Checkpointer

    cfg = _cfg(SAC={"batch_size": 8, "buffer_size": 128, "layers": [16, 16]})
    tr = Trainer(cfg, algo="SAC")
    state = jax.jit(tr.init_state)(jax.random.PRNGKey(0))
    ckpt = Checkpointer(str(tmp_path / "model"))
    ckpt.save(100, state.algo_state)
    ckpt.wait()
    zeroed = jax.tree.map(jnp.zeros_like, state.algo_state)
    restored = ckpt.restore(zeroed)
    orig = jax.tree.leaves(state.algo_state.actor_params)[0]
    rest = jax.tree.leaves(restored.actor_params)[0]
    np.testing.assert_allclose(np.asarray(orig), np.asarray(rest))
    assert ckpt.latest_step() == 100


def test_monitor_and_scalar_loggers(tmp_path):
    from deep_rl_grasping_tpu.training.callbacks import (
        CurriculumLogger,
        MonitorLogger,
        ScalarLogger,
    )

    d = str(tmp_path / "logs")
    mon = MonitorLogger(d)
    mon.log(12.5, 34.0, 0.75)
    mon.log(13.5, 30.0, 0.8)
    mon.close()
    lines = open(os.path.join(d, "log_file.monitor.csv")).read().splitlines()
    assert lines[0].startswith("#")
    assert lines[1] == "r,l,t,s"
    assert len(lines) == 4

    sc = ScalarLogger(d)
    sc.log(100, {"loss": 1.0, "sr": 0.5})
    sc.log(200, {"loss": 0.5, "sr": 0.6})
    sc.close()
    rows = open(os.path.join(d, "logs.csv")).read().splitlines()
    assert rows[0] == "step,loss,sr"
    assert len(rows) == 3

    cl = CurriculumLogger(d)
    cl.log(2, 0.125)
    cl.log(2, 0.125)  # same iteration -> no duplicate
    cl.log(3, 0.25)
    steps = open(os.path.join(d, "curriculum_steps.csv")).read().splitlines()
    assert len(steps) == 2


def test_update_batch_scale_preserves_replay_ratio():
    """tpu.update_batch_scale=K folds K sequential updates into one
    K-times-larger batch: sampled transitions per frame are unchanged and
    SAC's bc_tail tracks the scaled batch."""
    cfg = _cfg(SAC={"batch_size": 8, "buffer_size": 256, "layers": [16, 16],
                    "bc_weight": 1.0})
    cfg["tpu"]["demo_frames"] = 64
    cfg["tpu"]["demo_fraction"] = 0.25
    cfg["tpu"]["updates_per_step"] = 4
    cfg["tpu"]["update_batch_scale"] = 4
    tr = Trainer(cfg, algo="SAC")
    assert tr.updates_per_step == 1
    assert tr.batch_size == 32
    assert tr.demo_batch == 8
    assert tr.algo.batch_size == 32
    assert tr.algo.bc_tail == 8
    tr.learning_starts = 8
    state = jax.jit(tr.init_state)(jax.random.PRNGKey(0))
    state, _, _ = jax.jit(lambda s: tr.seed_demos(s, 64))(state)
    state, metrics = jax.jit(tr.train_step)(state)
    assert np.isfinite(float(metrics["critic_loss"]))
    assert "bc_gate" in metrics

    cfg2 = _cfg(SAC={"batch_size": 8, "buffer_size": 256, "layers": [16, 16]})
    cfg2["tpu"]["updates_per_step"] = 3
    cfg2["tpu"]["update_batch_scale"] = 2
    with pytest.raises(ValueError):
        Trainer(cfg2, algo="SAC")


def test_entropy_anneal_lambda_caps_fraction():
    """With tpu.entropy_anneal_lambda, the anneal fraction is capped by
    floor + (1-floor)*lambda: frames alone can't drive the target fully
    cold while the curriculum ramps (the r4 fix), but the floor lets it
    reach `floor` of the range at lambda=0 — a hard cap at lambda
    deadlocked r5b (hot target -> stochastic sr under the curriculum
    threshold -> lambda pinned at 0 for 1.26M frames)."""
    cfg = _cfg(SAC={"batch_size": 8, "buffer_size": 128, "layers": [16, 16],
                    "target_entropy": 0.0, "target_entropy_final": -4.0,
                    "target_entropy_anneal": 100})
    cfg["tpu"]["entropy_anneal_lambda"] = True
    tr = Trainer(cfg, algo="SAC")
    assert tr.entropy_anneal_floor == pytest.approx(0.5)
    frames = jnp.asarray(1000, jnp.int32)  # frames_frac = 1.0
    full = float(tr._target_entropy_at(frames, lam=jnp.asarray(1.0)))
    half = float(tr._target_entropy_at(frames, lam=jnp.asarray(0.5)))
    zero = float(tr._target_entropy_at(frames, lam=jnp.asarray(0.0)))
    assert full == pytest.approx(-4.0)
    assert half == pytest.approx(-3.0)   # 0.5 + 0.5*0.5 = 0.75 of range
    assert zero == pytest.approx(-2.0)   # floor alone: 0.5 of range
    # frames still cap the fraction when they are the binding constraint
    early = float(tr._target_entropy_at(jnp.asarray(50, jnp.int32),
                                        lam=jnp.asarray(1.0)))
    assert early == pytest.approx(-2.0)
    # floor=0 restores the strict lambda cap
    cfg0 = _cfg(SAC={"batch_size": 8, "buffer_size": 128, "layers": [16, 16],
                     "target_entropy": 0.0, "target_entropy_final": -4.0,
                     "target_entropy_anneal": 100})
    cfg0["tpu"]["entropy_anneal_lambda"] = True
    cfg0["tpu"]["entropy_anneal_floor"] = 0.0
    tr0 = Trainer(cfg0, algo="SAC")
    assert float(tr0._target_entropy_at(frames, lam=jnp.asarray(0.0))) == (
        pytest.approx(0.0)
    )
    # disabled flag: lambda is ignored
    cfg2 = _cfg(SAC={"batch_size": 8, "buffer_size": 128, "layers": [16, 16],
                     "target_entropy": 0.0, "target_entropy_final": -4.0,
                     "target_entropy_anneal": 100})
    tr2 = Trainer(cfg2, algo="SAC")
    assert float(tr2._target_entropy_at(frames, lam=jnp.asarray(0.0))) == (
        pytest.approx(-4.0)
    )


def test_sac_lr_decay_schedule():
    """SAC.lr_decay_steps builds a linear LR schedule: Adam's effective
    step size shrinks to lr_final_scale after decay completes."""
    from deep_rl_grasping_tpu.algos.sac import SAC

    cfg = {"SAC": {"batch_size": 8, "layers": [8, 8], "step_size": 1e-3,
                   "lr_decay_begin": 10, "lr_decay_steps": 10,
                   "lr_final_scale": 0.1},
           "tpu": {}}
    algo = SAC((3,), 2, cfg)
    # The optax schedule is embedded in the transform; probe it by applying
    # a unit gradient at different counts.
    params = {"w": jnp.ones((4,))}
    opt_state = algo.actor_tx.init(params)
    g = {"w": jnp.ones((4,))}
    # drive the count forward and measure update magnitude before/after decay
    mags = []
    for i in range(25):
        upd, opt_state = algo.actor_tx.update(g, opt_state, params)
        mags.append(float(jnp.abs(upd["w"]).max()))
    # Adam's unit-gradient step magnitude equals the LR once moments settle:
    # early steps (count <= 10) at 1e-3, late steps (count >= 20) at 1e-4.
    assert mags[5] == pytest.approx(1e-3, rel=0.15)
    assert mags[24] == pytest.approx(1e-4, rel=0.15)


def test_policy_npz_export_and_run(tmp_path):
    """Full durability path (VERDICT r4 weak #7): Orbax checkpoint ->
    scripts/export_policy.py -> committed .npz bundle -> `train.py run
    --npz` protocol eval, with nothing read from the gitignored dirs."""
    import io
    from contextlib import redirect_stdout

    from deep_rl_grasping_tpu.training.callbacks import Checkpointer
    from deep_rl_grasping_tpu.training.train import _bundle, main
    from deep_rl_grasping_tpu.utils import io_utils
    from scripts.export_policy import main as export_main

    cfg = _cfg(SAC={"batch_size": 8, "buffer_size": 128, "layers": [16, 16]})
    cfg["algorithm"] = "sac"
    tr = Trainer(cfg, algo="SAC")
    state = jax.jit(tr.init_state)(jax.random.PRNGKey(0))
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir, exist_ok=True)
    io_utils.save_yaml(cfg, os.path.join(run_dir, "config.yaml"))
    ckpt = Checkpointer(run_dir)
    ckpt.save_best(123, _bundle(state), 1.0)
    ckpt.wait()

    out_dir = str(tmp_path / "bundle")
    export_main([run_dir, "--out", out_dir])
    assert os.path.exists(os.path.join(out_dir, "policy.npz"))
    assert os.path.exists(os.path.join(out_dir, "config.yaml"))
    assert os.path.exists(os.path.join(out_dir, "PROVENANCE.md"))

    # the bundle round-trips the exact actor params
    from deep_rl_grasping_tpu.utils import policy_io

    params, obs_rms, _, meta = policy_io.load_policy(
        out_dir, state.algo_state.actor_params,
        state.normalizer.obs_rms, state.normalizer.ret_rms,
    )
    a = jax.tree.leaves(state.algo_state.actor_params)[0]
    b = jax.tree.leaves(params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert meta["algo"] == "SAC" and meta["params_field"] == "actor_params"

    # run --npz evaluates from the bundle alone
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["run", "--npz", out_dir, "--episodes", "2"])
    assert "Mean success rate:" in buf.getvalue()


def test_policy_npz_rejects_shape_drift(tmp_path):
    from deep_rl_grasping_tpu.utils import policy_io

    tree = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}
    rms = {"mean": jnp.zeros(()), "var": jnp.ones(()), "count": jnp.ones(())}
    policy_io.save_policy(
        str(tmp_path), tree, rms, rms,
        dict(algo="SAC", params_field="actor_params"),
    )
    wrong = {"w": jnp.ones((4, 2)), "b": jnp.zeros((2,))}
    with pytest.raises(ValueError, match="shape"):
        policy_io.load_policy(str(tmp_path), wrong, rms, rms)
    with pytest.raises(KeyError, match="missing"):
        policy_io.load_policy(
            str(tmp_path), {"extra": jnp.zeros((1,))}, rms, rms
        )
