"""Root-cause probe for the encoder-latent learning failure (VERDICT r3 #1).

Question: do the AE latents carry the spatial signal the policy needs?
Method: collect on-policy states (scripted expert + noise at a fixed
curriculum lambda), then fit closed-form ridge probes

    latent (100-d)            -> (dx, dy, dz to nearest object, gripper z)
    PCA-100 of masked image   -> same targets   (what 100 linear dims CAN do)
    raw masked image (4096-d) -> same targets   (upper bound)

If the latent probe fails while the PCA probe succeeds, the AE is throwing
the signal away; if both fail, the masked image itself lacks it (render or
masking bug); if the latent probe succeeds, the RL side is at fault.

Also dumps: latent stats (dead dims, scale), Pallas-vs-XLA masked-image and
latent deltas (training used the Pallas raster; the AE dataset was collected
through the XLA raycast), and a reconstruction grid PNG on on-policy states.

Usage:
  python scripts_dev/probe_latents.py --config configs/sac_encoder_flagship.yaml \
      --lam 0.0 --n 8192 --out out/probe_latents
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deep_rl_grasping_tpu.utils import jax_cache

jax_cache.setup()

from deep_rl_grasping_tpu.envs import scripted
from deep_rl_grasping_tpu.envs.grasp_env import BatchedGraspEnv, GraspEnv
from deep_rl_grasping_tpu.training.collect_dataset import masked_depth
from deep_rl_grasping_tpu.training.trainer import _maybe_load_encoder
from deep_rl_grasping_tpu.utils import config as cfg_util


def mlp_probe(X, Y, hidden=256, epochs=300, lr=1e-3, train_frac=0.8, seed=0):
    """2-layer MLP probe (jax, full-batch Adam); per-target held-out R^2.
    A LINEAR probe understates positional information in pixel-like
    features (position is coded in which units are active); the MLP is the
    decisive instrument for 'is the signal present'."""
    import optax

    n = X.shape[0]
    n_tr = int(n * train_frac)
    Xm, Xs = X[:n_tr].mean(0), X[:n_tr].std(0) + 1e-8
    Ym, Ys = Y[:n_tr].mean(0), Y[:n_tr].std(0) + 1e-8
    Xtr = jnp.asarray((X[:n_tr] - Xm) / Xs)
    Xte = jnp.asarray((X[n_tr:] - Xm) / Xs)
    Ytr = jnp.asarray((Y[:n_tr] - Ym) / Ys)
    Yte_raw = Y[n_tr:]

    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    d, t = X.shape[1], Y.shape[1]
    params = {
        "w1": jax.random.normal(k1, (d, hidden)) * (1.0 / np.sqrt(d)),
        "b1": jnp.zeros(hidden),
        "w2": jax.random.normal(k2, (hidden, t)) * (1.0 / np.sqrt(hidden)),
        "b2": jnp.zeros(t),
    }
    tx = optax.adam(lr)
    opt = tx.init(params)

    def fwd(p, x):
        h = jax.nn.relu(x @ p["w1"] + p["b1"])
        return h @ p["w2"] + p["b2"]

    @jax.jit
    def step(p, o):
        def loss(p):
            return jnp.mean((fwd(p, Xtr) - Ytr) ** 2)

        g = jax.grad(loss)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o

    for _ in range(epochs):
        params, opt = step(params, opt)
    pred = np.asarray(fwd(params, Xte)) * Ys + Ym
    ss_res = ((Yte_raw - pred) ** 2).sum(0)
    ss_tot = ((Yte_raw - Yte_raw.mean(0)) ** 2).sum(0) + 1e-12
    return 1.0 - ss_res / ss_tot


def ridge_probe(X, Y, alpha=1e-3, train_frac=0.8):
    """Closed-form ridge X->Y; returns per-target held-out R^2."""
    n = X.shape[0]
    n_tr = int(n * train_frac)
    Xm, Xs = X[:n_tr].mean(0), X[:n_tr].std(0) + 1e-8
    Ym = Y[:n_tr].mean(0)
    Xtr = (X[:n_tr] - Xm) / Xs
    Xte = (X[n_tr:] - Xm) / Xs
    Ytr, Yte = Y[:n_tr] - Ym, Y[n_tr:] - Ym
    d = Xtr.shape[1]
    W = np.linalg.solve(Xtr.T @ Xtr + alpha * n_tr * np.eye(d), Xtr.T @ Ytr)
    pred = Xte @ W
    ss_res = ((Yte - pred) ** 2).sum(0)
    ss_tot = (Yte**2).sum(0) + 1e-12
    return 1.0 - ss_res / ss_tot


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/sac_encoder_flagship.yaml")
    p.add_argument("--lam", type=float, default=0.0)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--num_envs", type=int, default=256)
    p.add_argument("--out", default="out/probe_latents")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cfg = cfg_util.load_config(args.config)
    enc_fn = _maybe_load_encoder(cfg)
    assert enc_fn is not None, "no encoder attached — check sensor.encoder_dir"
    env = GraspEnv(cfg, encoder_fn=enc_fn)
    benv = BatchedGraspEnv(env, args.num_envs)
    lam = jnp.asarray(args.lam, jnp.float32)

    @jax.jit
    def reset_batch(key):
        keys = jax.random.split(key, args.num_envs)
        return jax.vmap(lambda k: env.reset_env(k, lam, settle_substeps=48))(keys)

    @jax.jit
    def step_and_measure(states, key):
        ka, ks = jax.random.split(key)
        keys = jax.random.split(ka, args.num_envs)
        actions = jax.vmap(lambda s, k: scripted.scripted_full_action(env, s, k))(
            states, keys
        )
        states, obs, _, _, _, _ = benv.step(states, actions, benv.init_curriculum())
        # what the policy sees (Pallas raster on TPU)
        latent = obs[..., : env.encoding_dim]
        # XLA-raycast masked image (the AE's training distribution)
        img_xla = jax.vmap(lambda s: masked_depth(env, s))(states)
        lat_xla = jax.vmap(lambda im: env.encoder_fn(im[..., None]))(img_xla)
        # targets: nearest alive object displacement in the hand frame
        g = states.sim.gripper
        obj = states.sim.objects

        def targets(gq, pos, alive):
            d2 = jnp.sum((pos[:, :2] - gq[:2]) ** 2, -1)
            d2 = jnp.where(alive, d2, jnp.inf)
            k = jnp.argmin(d2)
            wx, wy = pos[k, 0] - gq[0], pos[k, 1] - gq[1]
            yaw = gq[3]
            cy, sy = jnp.cos(yaw), jnp.sin(yaw)
            ldx = cy * wx + sy * wy
            ldy = -(-sy * wx + cy * wy)
            return jnp.stack([ldx, ldy, pos[k, 2] - gq[2], gq[2]])

        tgt = jax.vmap(targets)(g.q, obj.pos, obj.alive)
        return states, latent, lat_xla, img_xla, tgt

    key = jax.random.PRNGKey(0)
    lat_all, latx_all, img_all, tgt_all = [], [], [], []
    total = 0
    while total < args.n:
        key, kr = jax.random.split(key)
        states = reset_batch(kr)
        for _ in range(10):
            key, ks = jax.random.split(key)
            states, lat, latx, img, tgt = step_and_measure(states, ks)
            lat_all.append(np.asarray(lat))
            latx_all.append(np.asarray(latx))
            img_all.append(np.asarray(img))
            tgt_all.append(np.asarray(tgt))
            total += lat.shape[0]
    L = np.concatenate(lat_all)[: args.n]
    LX = np.concatenate(latx_all)[: args.n]
    IM = np.concatenate(img_all)[: args.n]
    T = np.concatenate(tgt_all)[: args.n]

    names = ["dx_local", "dy_local", "dz_obj", "gripper_z"]
    print(f"\n=== latent stats (policy-view, n={args.n}, lambda={args.lam}) ===")
    std = L.std(0)
    print(f"  per-dim std: min {std.min():.4f} med {np.median(std):.4f} "
          f"max {std.max():.4f}; dead dims (std<1e-4): {(std < 1e-4).sum()}/100")
    print(f"  mean abs: {np.abs(L).mean():.4f}  max abs: {np.abs(L).max():.4f}")
    dl = np.abs(L - LX)
    print(f"  Pallas-vs-XLA latent |delta|: mean {dl.mean():.5f} "
          f"max {dl.max():.4f} (latent std med {np.median(std):.4f})")
    print(f"  masked-image nonzero frac: {np.mean(IM > 0):.4f}; "
          f"nonzero depth range [{IM[IM>0].min():.3f}, {IM[IM>0].max():.3f}]"
          if (IM > 0).any() else "  masked image ALL ZERO")

    print("\n=== ridge probes (held-out R^2 per target) ===")
    r2_lat = ridge_probe(L, T)
    r2_latx = ridge_probe(LX, T)
    flat = IM.reshape(len(IM), -1)
    # PCA-100 of the masked image
    mu = flat.mean(0)
    Xc = flat - mu
    # randomized-ish PCA via SVD on a subsample for speed
    U, S, Vt = np.linalg.svd(Xc[:4096], full_matrices=False)
    P100 = Xc @ Vt[:100].T
    r2_pca = ridge_probe(P100, T)
    r2_raw = ridge_probe(flat, T, alpha=1e-2)
    hdr = "  target      latent   latentXLA  PCA100   raw4096"
    print(hdr)
    for i, nm in enumerate(names):
        print(f"  {nm:<11} {r2_lat[i]:7.3f}  {r2_latx[i]:7.3f}  "
              f"{r2_pca[i]:7.3f}  {r2_raw[i]:7.3f}")

    print("\n=== MLP probes (held-out R^2 per target; the decisive test) ===")
    m_lat = mlp_probe(L, T)
    m_pca = mlp_probe(P100, T)
    m_img = mlp_probe(flat, T, hidden=128, epochs=200)
    print("  target      latentMLP  PCA100MLP  imgMLP")
    for i, nm in enumerate(names):
        print(f"  {nm:<11} {m_lat[i]:8.3f}  {m_pca[i]:8.3f}  {m_img[i]:7.3f}")

    # reconstruction grid on on-policy states
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from deep_rl_grasping_tpu.training.train_encoder import (
            load_trained_encoder, load_encoder_config, build_model)
        enc_dir = cfg_util.resolve_path(cfg["sensor"]["encoder_dir"])
        model = build_model(load_encoder_config(os.path.join(enc_dir, "config.yaml")))
        _, params = load_trained_encoder(enc_dir)
        xs = IM[:: len(IM) // 8][:8][..., None]
        recon = np.asarray(model.apply({"params": params}, jnp.asarray(xs)))
        fig, axes = plt.subplots(2, 8, figsize=(16, 4))
        for i in range(8):
            axes[0, i].imshow(xs[i, ..., 0], cmap="viridis")
            axes[1, i].imshow(recon[i, ..., 0], cmap="viridis")
            for r in range(2):
                axes[r, i].axis("off")
        fig.savefig(os.path.join(args.out, "onpolicy_recon.png"), dpi=90,
                    bbox_inches="tight")
        print(f"\nwrote {args.out}/onpolicy_recon.png")
    except Exception as e:  # matplotlib optional
        print(f"viz skipped: {e}")

    np.savez_compressed(
        os.path.join(args.out, "probe_data.npz"),
        latent=L, latent_xla=LX, targets=T, images=IM.astype(np.float16),
        r2_latent=r2_lat, r2_pca=r2_pca, r2_raw=r2_raw,
        r2_mlp_latent=m_lat, r2_mlp_pca=m_pca, r2_mlp_img=m_img,
    )
    print(f"wrote {args.out}/probe_data.npz")


if __name__ == "__main__":
    main()
