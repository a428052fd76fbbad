"""TRPO in JAX.

Replaces stable-baselines TRPO (sb_helper.py:129-137; config TRPO block:
max_iters, batch_size = timesteps per batch, step_size = vf step size).
Natural policy gradient with a KL trust region: conjugate-gradient solve of
F x = g using Fisher-vector products (double-backprop through the mean KL),
then a backtracking line search on the surrogate + KL constraint. The value
function takes `vf_iters` Adam steps on the same rollout.

All of it — CG loop, FVPs, line search — is pure jax.lax control flow, so
the full TRPO update is one compiled program (the reference runs this in
Python over TF sess.run calls).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from deep_rl_grasping_tpu.algos.ppo import ActorCritic


@struct.dataclass
class TRPOState:
    params: Any
    vf_opt: Any
    step: jnp.ndarray


class TRPO:
    def __init__(self, obs_shape, action_dim, config, discrete=False,
                 image_obs=None, pmean_axis=None):
        c = config.get("TRPO", {})
        self.gamma = float(config.get("discount_factor", 0.99))
        self.max_kl = float(c.get("max_kl", 0.01))
        self.cg_iters = int(c.get("cg_iters", 10))
        self.cg_damping = float(c.get("cg_damping", 0.1))
        self.vf_lr = float(c.get("step_size", 3e-4))
        self.vf_iters = int(c.get("vf_iters", 3))
        self.n_steps = int(c.get("n_steps", 128))
        self.gae_lambda = float(c.get("lam", 0.98))
        self.entcoeff = float(c.get("entcoeff", 0.0))
        self.discrete = discrete
        self.action_dim = int(action_dim)
        self.obs_shape = tuple(obs_shape)
        self.pmean_axis = pmean_axis
        if image_obs is None:
            image_obs = len(obs_shape) == 3
        # TRPO.layers: head width matters for encoder-latent obs (same
        # capacity finding as SAC/DQN — [64,64] cannot untangle the 100-d
        # AE code; scripts_dev/probe_bc.py).
        layers = tuple(c.get("layers", (64, 64)))
        self.net = ActorCritic(self.action_dim, discrete, layers, image_obs)
        self.vf_tx = optax.adam(self.vf_lr)

    def init(self, key) -> TRPOState:
        params = self.net.init(key, jnp.zeros((1,) + self.obs_shape))["params"]
        return TRPOState(
            params=params, vf_opt=self.vf_tx.init(params),
            step=jnp.asarray(0, jnp.int32),
        )

    # --------------------------------------------------------------- dists

    def _dist(self, params, obs):
        logits, log_std, value = self.net.apply({"params": params}, obs)
        return logits, log_std, value

    def _logp(self, logits, log_std, action):
        if self.discrete:
            logp_all = jax.nn.log_softmax(logits)
            return jnp.take_along_axis(
                logp_all, action[..., None].astype(jnp.int32), -1
            )[..., 0]
        std = jnp.exp(log_std)
        return (
            -0.5 * (((action - logits) / std) ** 2 + 2 * log_std + jnp.log(2 * jnp.pi))
        ).sum(-1)

    def _kl(self, p_old, p_new):
        """Mean KL(old || new) from (logits, log_std) pairs."""
        if self.discrete:
            lo, ln = jax.nn.log_softmax(p_old[0]), jax.nn.log_softmax(p_new[0])
            return (jnp.exp(lo) * (lo - ln)).sum(-1).mean()
        mo, so = p_old[0], p_old[1]
        mn, sn = p_new[0], p_new[1]
        kl = (
            sn - so
            + (jnp.exp(2 * so) + (mo - mn) ** 2) / (2 * jnp.exp(2 * sn))
            - 0.5
        ).sum(-1)
        return kl.mean()

    def act(self, params, obs, key, deterministic=False):
        logits, log_std, value = self._dist(params, obs)
        if self.discrete:
            action = jnp.where(
                deterministic, jnp.argmax(logits, -1),
                jax.random.categorical(key, logits),
            ).astype(jnp.int32)
        else:
            action = logits + jnp.where(
                deterministic, 0.0, 1.0
            ) * jax.random.normal(key, logits.shape) * jnp.exp(log_std)
            action = jnp.clip(action, -1.0, 1.0)
        return action, self._logp(logits, log_std, action), value

    def value(self, params, obs):
        return self.net.apply({"params": params}, obs)[2]

    gae = None  # shares PPO's; set below

    # --------------------------------------------------------------- update

    def update(self, state: TRPOState, batch, key=None):
        obs, action = batch["obs"], batch["action"]
        adv = batch["advantage"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        old_logits, old_log_std, _ = self._dist(state.params, obs)
        old_logp = self._logp(old_logits, old_log_std, action)
        p_old = (jax.lax.stop_gradient(old_logits),
                 None if old_log_std is None else jax.lax.stop_gradient(old_log_std))

        flat, unravel = jax.flatten_util.ravel_pytree(state.params)

        def surrogate(params):
            logits, log_std, _ = self._dist(params, obs)
            logp = self._logp(logits, log_std, action)
            return jnp.mean(jnp.exp(logp - old_logp) * adv)

        def mean_kl(params):
            logits, log_std, _ = self._dist(params, obs)
            return self._kl(p_old, (logits, log_std))

        g = jax.grad(surrogate)(state.params)
        g_flat, _ = jax.flatten_util.ravel_pytree(g)
        if self.pmean_axis is not None:
            g_flat = jax.lax.pmean(g_flat, self.pmean_axis)

        def fvp(v_flat):
            def kl_grad_dot_v(params):
                kg = jax.grad(mean_kl)(params)
                kg_flat, _ = jax.flatten_util.ravel_pytree(kg)
                return jnp.dot(kg_flat, v_flat)

            h = jax.grad(kl_grad_dot_v)(state.params)
            h_flat, _ = jax.flatten_util.ravel_pytree(h)
            if self.pmean_axis is not None:
                h_flat = jax.lax.pmean(h_flat, self.pmean_axis)
            return h_flat + self.cg_damping * v_flat

        # Conjugate gradient solve F x = g
        def cg_body(carry, _):
            x, r, p, rr = carry
            Ap = fvp(p)
            alpha = rr / jnp.maximum(jnp.dot(p, Ap), 1e-12)
            x = x + alpha * p
            r = r - alpha * Ap
            rr_new = jnp.dot(r, r)
            p = r + (rr_new / jnp.maximum(rr, 1e-12)) * p
            return (x, r, p, rr_new), None

        x0 = jnp.zeros_like(g_flat)
        (x, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, g_flat, g_flat, jnp.dot(g_flat, g_flat)), None,
            length=self.cg_iters,
        )
        shs = 0.5 * jnp.dot(x, fvp(x))
        step_scale = jnp.sqrt(self.max_kl / jnp.maximum(shs, 1e-12))
        full_step = step_scale * x
        expected_improve = jnp.dot(g_flat, full_step)

        surr_before = surrogate(state.params)

        def try_step(frac):
            new_flat = flat + frac * full_step
            new_params = unravel(new_flat)
            surr = surrogate(new_params)
            kl = mean_kl(new_params)
            ok = (surr - surr_before > 0.1 * frac * expected_improve) & (
                kl <= self.max_kl * 1.5
            )
            return new_flat, ok

        # Backtracking line search over fixed fractions (sb uses 10 steps)
        def ls_body(carry, frac):
            best_flat, found = carry
            cand, ok = try_step(frac)
            take = ok & ~found
            best_flat = jnp.where(take, cand, best_flat)
            return (best_flat, found | ok), None

        fracs = 0.5 ** jnp.arange(10, dtype=jnp.float32)
        (new_flat, found), _ = jax.lax.scan(ls_body, (flat, False), fracs)
        params = unravel(new_flat)

        # Value function fit (vf_iters Adam steps on the same data)
        def vf_loss_fn(p):
            v = self.net.apply({"params": p}, obs)[2]
            return jnp.mean((v - batch["return"]) ** 2)

        def vf_body(carry, _):
            p, opt = carry
            grads = jax.grad(vf_loss_fn)(p)
            if self.pmean_axis is not None:
                grads = jax.lax.pmean(grads, self.pmean_axis)
            updates, opt = self.vf_tx.update(grads, opt, p)
            return (optax.apply_updates(p, updates), opt), None

        (params, vf_opt), _ = jax.lax.scan(
            vf_body, (params, state.vf_opt), None, length=self.vf_iters
        )

        metrics = dict(
            surrogate=surr_before,
            kl=mean_kl(params),
            vf_loss=vf_loss_fn(params),
            line_search_ok=found.astype(jnp.float32),
        )
        return TRPOState(params=params, vf_opt=vf_opt, step=state.step + 1), metrics


# Reuse PPO's GAE computation
from deep_rl_grasping_tpu.algos.ppo import PPO as _PPO  # noqa: E402

TRPO.gae = _PPO.gae
