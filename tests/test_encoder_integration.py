"""Autoencoder pipeline integration: AE training reduces reconstruction
error, and a trained encoder plugs into the env's observation path
(EncodedDepthImgSensor equivalent, sensor.py:206-230)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from deep_rl_grasping_tpu.models import autoencoder as ae
from deep_rl_grasping_tpu.envs.grasp_env import GraspEnv
from deep_rl_grasping_tpu.utils import config as cfg_util

pytestmark = pytest.mark.physics  # heavy tier: real solver/env steps



def test_ae_shapes_and_training_step():
    model = ae.SimpleAutoEncoder(encoding_dim=100)
    state, tx = ae.create_ae_train_state(model, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 1))
    recon = model.apply({"params": state.params}, x)
    assert recon.shape == (8, 64, 64, 1)
    z = model.apply({"params": state.params}, x, method=model.encode)
    assert z.shape == (8, 100)

    step = jax.jit(lambda s, b: ae.ae_train_step(model, tx, s, b))
    state, loss0 = step(state, x)
    for _ in range(30):
        state, loss = step(state, x)
    assert float(loss) < float(loss0), "AE loss did not decrease"


def test_encoder_plugs_into_env_obs():
    model = ae.SimpleAutoEncoder(encoding_dim=100)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))[
        "params"
    ]

    def encoder_fn(img):
        return model.apply({"params": params}, img[None], method=model.encode)[0]

    cfg = cfg_util.load_config("tests/configs/test_encoder.yaml")
    env = GraspEnv(cfg, encoder_fn=encoder_fn)
    state, obs = jax.jit(lambda k: env.reset(k, jnp.asarray(0.0)))(
        jax.random.PRNGKey(0)
    )
    # encoder (100) + actuator width (1) = 101 (robot.py:186-190)
    assert obs.shape == (101,)
    assert np.all(np.isfinite(np.asarray(obs)))


def test_time_feature_wrapper():
    from deep_rl_grasping_tpu.envs import wrappers

    obs = jnp.ones((4, 10))
    steps = jnp.array([0, 25, 50, 100])
    out = wrappers.append_time_feature(obs, steps, 100)
    assert out.shape == (4, 11)
    np.testing.assert_allclose(np.asarray(out[:, -1]), [1.0, 0.75, 0.5, 0.0])
    out_t = wrappers.append_time_feature(obs, steps, 100, test_mode=True)
    np.testing.assert_allclose(np.asarray(out_t[:, -1]), np.ones(4))


def test_time_feature_wired_into_env():
    """config time_feature: True extends flat observations by the remaining-
    time fraction (the reference's --timefeature wrapping of the env,
    train_stable_baselines.py:52-67)."""
    cfg = cfg_util.load_config("tests/configs/test_encoder.yaml")
    cfg["time_feature"] = True
    env = GraspEnv(cfg)
    assert env.time_feature
    assert env.obs_shape == (102,)  # encoder 100 + width 1 + time 1
    state, obs = jax.jit(lambda k: env.reset(k, jnp.asarray(0.0)))(
        jax.random.PRNGKey(0)
    )
    assert obs.shape == (102,)
    # At episode step 0 the remaining-time feature is exactly 1.
    np.testing.assert_allclose(float(obs[-1]), 1.0)

    # Image observations never get the feature (reference parity).
    cfg2 = cfg_util.load_config("tests/configs/test_continuous.yaml")
    cfg2["time_feature"] = True
    env2 = GraspEnv(cfg2)
    assert not env2.time_feature
