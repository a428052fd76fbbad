"""deep_rl_grasping_tpu — a TPU-native re-design of BarisYazici/deep-rl-grasping.

A batched, jit-compiled robotic grasping framework: analytic rigid-body
physics, ray-cast depth/RGB/segmentation rendering, and first-party JAX RL
algorithms (SAC / DQN / BDQ / PPO / DDPG / TRPO), running thousands of
environments per chip and scaling over a `jax.sharding.Mesh`.

Reference capability map: see SURVEY.md at the repo root. The reference
(PyBullet + TF1 + stable-baselines) steps one env at ~11-22 steps/s on CPU;
this framework fuses physics + render + learning into XLA programs.
"""

__version__ = "0.1.0"
