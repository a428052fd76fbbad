"""On-device depth-image dataset collection for autoencoder training.

Replaces scripts/collect_dataset.py (a scripted single-env policy writing
18k train + 2k test images to pickle at ~1 img/s). Here the batched env
rolls out a random exploration policy and the masked depth preprocessing of
train_encoder.py:19-27 (zero out the support surface and gripper via the
segmentation mask) runs inside the same jitted program; thousands of images
per second come back in one device array.

Usage:
  python -m deep_rl_grasping_tpu.training.collect_dataset \
      --config configs/simplified_object_picking.yaml \
      --out encoder_files/dataset.npz --train 18000 --test 2000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax
import jax.numpy as jnp
import numpy as np

from deep_rl_grasping_tpu.envs.grasp_env import BatchedGraspEnv, GraspEnv
from deep_rl_grasping_tpu.utils import config as cfg_util


def masked_depth(env: GraspEnv, state):
    """Depth image with surface + gripper zeroed (train_encoder.py:19-27)."""
    _, depth, mask = env.render_raw(state)
    img = depth
    img = jnp.where(mask == 0, 0.0, img)
    gripper_id = (env.max_slots + 3) if env.sim_params.has_tray else (env.max_slots + 1)
    img = jnp.where(mask == gripper_id, 0.0, img)
    if env.scene_type == "OnTable":
        img = jnp.where((mask == 1) | (mask == 2), 0.0, img)
    return img


def collect(config, n_images, num_envs=128, seed=0, steps_per_reset=20,
            keep_task=False, mix_lambda=False):
    cfg = cfg_util.load_config(config)
    if not keep_task:
        # Default (reference scripts/collect_dataset.py parity): descend-policy
        # env. For encoder-latent training on the FULL task pass keep_task=True
        # so the images cover the full task's scene statistics (spawn heights,
        # object counts) — an AE trained on simplified-task images produces
        # out-of-distribution latents on the full task (TRAINING_NOTES.md,
        # sac_encoder_flagship_v1 failure diagnosis).
        cfg["simplified"] = True
    cfg["robot"]["discrete"] = False  # random continuous exploration policy
    env = GraspEnv(cfg)
    benv = BatchedGraspEnv(env, num_envs)
    curriculum = benv.init_curriculum()

    # Host loop over steps (a scan stacking per-step image batches trips an
    # XLA memory-space-assignment crash on the TPU compiler in this image).
    @jax.jit
    def reset_batch(key, lam):
        keys = jax.random.split(key, num_envs)
        states, _ = jax.vmap(lambda k: env.reset(k, lam))(keys)
        return states

    @jax.jit
    def step_collect(states, k, lam):
        acts = jax.random.uniform(
            k, (num_envs, env.action_dim), minval=-1.0, maxval=1.0
        )
        states, _, _, _, _ = jax.vmap(
            lambda s, a: env.step(s, a, lam)
        )(states, acts)
        imgs = jax.vmap(lambda s: masked_depth(env, s))(states)
        return states, imgs

    out = []
    total = 0
    key = jax.random.PRNGKey(seed)
    while total < n_images:
        key, kr, kl = jax.random.split(key, 3)
        # mix_lambda: sample a curriculum difficulty per reset so the dataset
        # covers the whole image distribution the agent sees from lambda=0
        # (objects centered under the gripper, min spawn height) through
        # lambda=1 (scattered piles, full height range). Training-time latents
        # are only as good as the AE's coverage of the visited states.
        lam = jax.random.uniform(kl) if mix_lambda else jnp.asarray(1.0)
        states = reset_batch(kr, lam)
        for _ in range(steps_per_reset):
            key, ka = jax.random.split(key)
            states, imgs = step_collect(states, ka, lam)
            out.append(np.asarray(imgs))
            total += imgs.shape[0]
        print(f"collected {total}/{n_images}")
    return np.concatenate(out)[:n_images]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/simplified_object_picking.yaml")
    p.add_argument("--out", default="encoder_files/dataset.npz")
    p.add_argument("--train", type=int, default=18000)
    p.add_argument("--test", type=int, default=2000)
    p.add_argument("--num_envs", type=int, default=128)
    p.add_argument("--keep_task", action="store_true",
                   help="keep the config's task (no simplified override); use "
                        "for full-task AE datasets")
    p.add_argument("--mix_lambda", action="store_true",
                   help="sample curriculum difficulty per reset instead of "
                        "pinning lambda=1")
    args = p.parse_args(argv)

    imgs = collect(args.config, args.train + args.test, args.num_envs,
                   keep_task=args.keep_task, mix_lambda=args.mix_lambda)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(
        args.out,
        train=imgs[: args.train, ..., None].astype(np.float32),
        test=imgs[args.train :, ..., None].astype(np.float32),
    )
    print(f"wrote {args.out}: train {args.train}, test {args.test}")


if __name__ == "__main__":
    main()
