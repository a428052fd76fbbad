"""Autoencoder training CLI: train / test / visualize.

Replaces training/train_encoder.py + gripperEnv/encoders.py's Keras loop:
MSE objective, Adam lr from config/encoder.yaml, early stopping (patience
25 epochs on val loss), best-weights checkpointing, history.csv — all with
the jit-compiled flax model (models/autoencoder.py) on batched device data.

  python -m deep_rl_grasping_tpu.training.train_encoder train \
      --config configs/encoder.yaml --data encoder_files/dataset.npz \
      --model_dir encoder_files/default
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax
import jax.numpy as jnp
import numpy as np

from deep_rl_grasping_tpu.models import autoencoder as ae
from deep_rl_grasping_tpu.utils import config as cfg_util
from deep_rl_grasping_tpu.utils import io_utils

DEFAULT_ENCODER_CONFIG = {
    "network": [
        {"filters": 32, "kernel_size": 7, "strides": 2},
        {"filters": 32, "kernel_size": 5, "strides": 2},
        {"filters": 32, "kernel_size": 3, "strides": 2},
    ],
    "encoding_dim": 100,
    "learning_rate": 0.0002,
    "batch_size": 128,
    "epochs": 120,
}


def load_encoder_config(path):
    if path and os.path.exists(cfg_util.resolve_path(path)):
        return io_utils.load_yaml(cfg_util.resolve_path(path))
    return dict(DEFAULT_ENCODER_CONFIG)


def build_model(enc_cfg):
    return ae.SimpleAutoEncoder.from_config(enc_cfg)


def load_trained_encoder(model_dir):
    """Returns (encode_fn, params) for use as GraspEnv.encoder_fn."""
    enc_cfg = load_encoder_config(os.path.join(model_dir, "config.yaml"))
    model = build_model(enc_cfg)
    with np.load(os.path.join(model_dir, "weights.npz"), allow_pickle=True) as f:
        params = jax.tree.map(jnp.asarray, f["params"].item())

    def encode_fn(img):
        # img: (H, W, 1) single image -> (D,)
        return model.apply({"params": params}, img[None], method=model.encode)[0]

    return encode_fn, params


def train(args):
    enc_cfg = load_encoder_config(args.config)
    os.makedirs(args.model_dir, exist_ok=True)
    io_utils.save_yaml(enc_cfg, os.path.join(args.model_dir, "config.yaml"))

    with np.load(cfg_util.resolve_path(args.data)) as f:
        train_x = f["train"]
    # validation_split=0.1 + shuffle (encoders.py:46-48)
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(train_x))
    n_val = max(1, len(train_x) // 10)
    val_x = jnp.asarray(train_x[perm[:n_val]])
    trn_x = train_x[perm[n_val:]]

    model = build_model(enc_cfg)
    state, tx = ae.create_ae_train_state(
        model, jax.random.PRNGKey(0), float(enc_cfg["learning_rate"])
    )
    step = jax.jit(lambda s, b: ae.ae_train_step(model, tx, s, b))
    eval_loss = jax.jit(
        lambda p, x: jnp.mean((model.apply({"params": p}, x) - x) ** 2)
    )

    bs = int(enc_cfg["batch_size"])
    best_val = np.inf
    patience, bad_epochs = 25, 0
    history_path = os.path.join(args.model_dir, "history.csv")
    with open(history_path, "w", newline="") as hist_f:
        hist = csv.writer(hist_f)
        hist.writerow(["epoch", "loss", "val_loss"])
        for epoch in range(int(enc_cfg["epochs"])):
            perm = rng.permutation(len(trn_x))
            losses = []
            for i in range(0, len(trn_x) - bs + 1, bs):
                batch = jnp.asarray(trn_x[perm[i : i + bs]])
                state, loss = step(state, batch)
                losses.append(float(loss))
            vl = float(eval_loss(state.params, val_x))
            tl = float(np.mean(losses))
            hist.writerow([epoch, tl, vl])
            hist_f.flush()
            print(f"epoch {epoch}: loss {tl:.6f} val {vl:.6f}")
            if vl < best_val:
                best_val = vl
                bad_epochs = 0
                np.savez(
                    os.path.join(args.model_dir, "weights.npz"),
                    params=np.asarray(
                        jax.tree.map(np.asarray, state.params), dtype=object
                    ),
                )
            else:
                bad_epochs += 1
                if bad_epochs >= patience:
                    print(f"early stopping at epoch {epoch}")
                    break
    print(f"best val MSE {best_val:.6f}")


def test(args):
    enc_cfg = load_encoder_config(os.path.join(args.model_dir, "config.yaml"))
    model = build_model(enc_cfg)
    _, params = load_trained_encoder(args.model_dir)
    with np.load(cfg_util.resolve_path(args.data)) as f:
        test_x = jnp.asarray(f["test"])
    mse = float(jnp.mean((model.apply({"params": params}, test_x) - test_x) ** 2))
    print(f"test MSE {mse:.6f}")


def visualize(args):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    enc_cfg = load_encoder_config(os.path.join(args.model_dir, "config.yaml"))
    model = build_model(enc_cfg)
    _, params = load_trained_encoder(args.model_dir)
    with np.load(cfg_util.resolve_path(args.data)) as f:
        x = f["test"][:8]
    recon = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    fig, axes = plt.subplots(3, 8, figsize=(16, 6))
    for i in range(8):
        axes[0, i].imshow(x[i, ..., 0], cmap="gray")
        axes[1, i].imshow(recon[i, ..., 0], cmap="gray")
        axes[2, i].imshow(np.abs(x[i, ..., 0] - recon[i, ..., 0]), cmap="hot")
        for r in range(3):
            axes[r, i].axis("off")
    out = os.path.join(args.model_dir, "reconstructions.png")
    fig.savefig(out, dpi=100, bbox_inches="tight")
    print(f"wrote {out}")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(required=True)
    for name, fn in [("train", train), ("test", test), ("visualize", visualize)]:
        sp = sub.add_parser(name)
        sp.add_argument("--config", default="configs/encoder.yaml")
        sp.add_argument("--data", default="encoder_files/dataset.npz")
        sp.add_argument("--model_dir", default="encoder_files/default")
        sp.set_defaults(func=fn)
    args = p.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
