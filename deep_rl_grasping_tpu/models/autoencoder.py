"""Convolutional autoencoder for depth-image perception.

Flax re-design of the reference's Keras SimpleAutoEncoder
(gripperEnv/encoders.py:70-136; architecture from config/encoder.yaml):
encoder = 3 x [Conv(32, k 7/5/3, stride 2) + LeakyReLU] -> Dense(100 latent)
+ LeakyReLU; decoder mirrors with Dense -> reshape -> [UpSample + Conv +
LeakyReLU] -> final Conv to 1 channel. Loss MSE, Adam lr 2e-4.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

CDTYPE = jnp.bfloat16


class ConvEncoder(nn.Module):
    filters: Sequence[int] = (32, 32, 32)
    kernels: Sequence[int] = (7, 5, 3)
    strides: Sequence[int] = (2, 2, 2)
    encoding_dim: int = 100
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x):
        x = x.astype(CDTYPE)
        for f, k, s in zip(self.filters, self.kernels, self.strides):
            x = nn.Conv(f, (k, k), strides=(s, s), padding="SAME", dtype=CDTYPE)(x)
            x = nn.leaky_relu(x, self.alpha)
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.Dense(self.encoding_dim, dtype=CDTYPE)(x)
        return nn.leaky_relu(x.astype(jnp.float32), self.alpha)


class ConvDecoder(nn.Module):
    filters: Sequence[int] = (32, 32, 32)
    kernels: Sequence[int] = (7, 5, 3)
    strides: Sequence[int] = (2, 2, 2)
    alpha: float = 0.1
    base_hw: int = 8  # 64 / 2^3

    @nn.compact
    def __call__(self, z):
        n = len(self.filters)
        hw, c = self.base_hw, self.filters[-1]
        x = nn.Dense(hw * hw * c, dtype=CDTYPE)(z.astype(CDTYPE))
        x = nn.leaky_relu(x, self.alpha)
        x = x.reshape(x.shape[:-1] + (hw, hw, c))
        # mirrored upsampling path (encoders.py:117-128)
        for i in reversed(range(1, n)):
            s = self.strides[i]
            x = jax.image.resize(
                x, x.shape[:-3] + (x.shape[-3] * s, x.shape[-2] * s, x.shape[-1]),
                method="nearest",
            )
            x = nn.Conv(self.filters[i - 1], (self.kernels[i], self.kernels[i]),
                        padding="SAME", dtype=CDTYPE)(x)
            x = nn.leaky_relu(x, self.alpha)
        s = self.strides[0]
        x = jax.image.resize(
            x, x.shape[:-3] + (x.shape[-3] * s, x.shape[-2] * s, x.shape[-1]),
            method="nearest",
        )
        x = nn.Conv(1, (self.kernels[0], self.kernels[0]), padding="SAME",
                    dtype=CDTYPE)(x)
        return x.astype(jnp.float32)


class SimpleAutoEncoder(nn.Module):
    """Encoder + decoder; config dict mirrors config/encoder.yaml."""

    filters: Sequence[int] = (32, 32, 32)
    kernels: Sequence[int] = (7, 5, 3)
    strides: Sequence[int] = (2, 2, 2)
    encoding_dim: int = 100
    alpha: float = 0.1
    image_size: int = 64

    @classmethod
    def from_config(cls, config):
        net = config["network"]
        return cls(
            filters=tuple(l["filters"] for l in net),
            kernels=tuple(l["kernel_size"] for l in net),
            strides=tuple(l["strides"] for l in net),
            encoding_dim=int(config["encoding_dim"]),
            alpha=float(config.get("alpha", 0.1)),
        )

    def setup(self):
        down = 1
        for s in self.strides:
            down *= s
        self.encoder = ConvEncoder(
            self.filters, self.kernels, self.strides, self.encoding_dim, self.alpha
        )
        self.decoder = ConvDecoder(
            self.filters, self.kernels, self.strides, self.alpha,
            base_hw=self.image_size // down,
        )

    def __call__(self, x):
        return self.decoder(self.encoder(x))

    def encode(self, x):
        return self.encoder(x)


@struct.dataclass
class AETrainState:
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def create_ae_train_state(model, key, learning_rate=2e-4, image_size=64):
    params = model.init(key, jnp.zeros((1, image_size, image_size, 1)))["params"]
    tx = optax.adam(learning_rate)
    return AETrainState(
        params=params, opt_state=tx.init(params), step=jnp.asarray(0)
    ), tx


def ae_train_step(model, tx, state: AETrainState, batch):
    """One MSE training step (encoders.py:40-50 equivalent)."""

    def loss_fn(params):
        recon = model.apply({"params": params}, batch)
        return jnp.mean((recon - batch) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return AETrainState(params=params, opt_state=opt_state, step=state.step + 1), loss
