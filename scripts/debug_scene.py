"""Headless scene inspector (reference scripts/debug_scene.py equivalent).

The reference opens a PyBullet GUI with slider/random agents; there is no GUI
on a TPU host, so this renders the wrist camera and a top-down view to PNG
while stepping a random or scripted agent.

  python scripts/debug_scene.py --config configs/gripper_grasp.yaml \
      --agent random --steps 20 --out /tmp/scene
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/gripper_grasp.yaml")
    p.add_argument("--agent", choices=["random", "scripted"], default="random")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--out", default="debug_scene_out")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from deep_rl_grasping_tpu.agents.agents import RandomAgent, ScriptedGraspAgent
    from deep_rl_grasping_tpu.envs.gym_adapter import GymGraspEnv

    env = GymGraspEnv(args.config, seed=args.seed)
    agent = (
        RandomAgent(env) if args.agent == "random" else ScriptedGraspAgent(env)
    )
    os.makedirs(args.out, exist_ok=True)
    obs = env.reset()
    for t in range(args.steps):
        rgb, depth, mask = (np.asarray(x) for x in env.env.render_raw(env._state))
        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        axes[0].imshow(rgb)
        axes[0].set_title("rgb")
        axes[1].imshow(depth, cmap="viridis")
        axes[1].set_title("depth")
        axes[2].imshow(mask, cmap="tab20")
        axes[2].set_title("segmentation")
        for ax in axes:
            ax.axis("off")
        fig.savefig(os.path.join(args.out, f"step_{t:03d}.png"), dpi=80,
                    bbox_inches="tight")
        plt.close(fig)
        action = agent.act(obs)
        obs, reward, done, info = env.step(action)
        pos, _ = env.get_pose()
        print(
            f"step {t}: reward {reward:.2f} done {done} "
            f"pos {np.round(pos, 3)} width {env.get_gripper_width():.3f}"
        )
        if done:
            obs = env.reset()
            if hasattr(agent, "reset"):
                agent.reset()
    print(f"wrote frames to {args.out}/")


if __name__ == "__main__":
    main()
