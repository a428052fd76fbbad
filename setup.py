from setuptools import find_packages, setup

setup(
    name="deep_rl_grasping_tpu",
    version="0.1.0",
    description=(
        "TPU-native robotic grasping RL framework: batched JAX physics, "
        "ray-cast rendering, and first-party SAC/DQN/BDQ/PPO/DDPG/TRPO"
    ),
    packages=find_packages(exclude=("tests", "scripts_dev")),
    python_requires=">=3.10",
    # jax/flax/optax/orbax/numpy are provided by the base image; no pins here.
)
