import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import faulthandler
faulthandler.dump_traceback_later(60, repeat=True)

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_grasp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

print("importing env...", flush=True)
t0 = time.time()
from deep_rl_grasping_tpu.envs.gym_adapter import GymGraspEnv

print("import done", time.time() - t0, flush=True)
t0 = time.time()
env = GymGraspEnv("tests/configs/test_continuous.yaml")
print("env built", time.time() - t0, flush=True)
t0 = time.time()
obs = env.reset()
print("reset ok", obs.shape, "in", time.time() - t0, flush=True)
t0 = time.time()
a = np.zeros(5, np.float32)
obs, r, done, info = env.step(a)
print("step compiled in", time.time() - t0, flush=True)
print("reward", r, "done", done, "status", info["status"], flush=True)
pos, _ = env.get_pose()
print("pose", pos, flush=True)
t0 = time.time()
for _ in range(5):
    obs, r, done, info = env.step(env.action_space.sample())
print("5 steps in", time.time() - t0, flush=True)
print("width", env.get_gripper_width(), flush=True)
env.close_gripper()
print("width after close", env.get_gripper_width(), flush=True)
