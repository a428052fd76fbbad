"""Component-level TPU throughput probe for the full-task env step.

Times (a) the fused Pallas solver alone, (b) the fused raster alone,
(c) action-decode + finalize glue, (d) the full BatchedGraspEnv.step, at a
given env count — so the 100k steps/s attack (VERDICT r2 item 5) aims at
the real bottleneck instead of guessing.

Usage: python scripts_dev/perf_probe.py [--envs 4096] [--iters 30]
"""
import sys, os, time, argparse
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from deep_rl_grasping_tpu.utils import jax_cache
jax_cache.setup()  # CPU runs get a host-fingerprinted cache dir

p = argparse.ArgumentParser()
p.add_argument('--envs', type=int, default=4096)
p.add_argument('--iters', type=int, default=30)
p.add_argument('--config', default='configs/gripper_grasp.yaml')
args = p.parse_args()

from deep_rl_grasping_tpu.envs.grasp_env import GraspEnv, BatchedGraspEnv
from deep_rl_grasping_tpu.ops import solver_pallas, raster_pallas
from deep_rl_grasping_tpu.render import raycast
from deep_rl_grasping_tpu.utils import config as cfg_util

cfg = cfg_util.load_config(args.config)
env = GraspEnv(cfg)
B = args.envs
benv = BatchedGraspEnv(env, B)
cur = benv.init_curriculum()
states, obs = jax.jit(benv.reset)(jax.random.PRNGKey(0), cur)
params = env.sim_params
substeps = env.gripper_substeps


def timeit(name, fn, *a, scale=1):
    out = fn(*a)
    jax.block_until_ready(out)
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{name:<34} {dt*1e3:8.2f} ms/call  -> {scale*B/dt:12.0f} env steps/s")
    return dt


# (a) solver kernel alone, one control step's worth of substeps
solve = jax.jit(lambda s: solver_pallas.run_batched_sim(s, params, substeps))
t_solve = timeit(f"solver x{substeps} substeps", solve, states.sim)

# (b) raster alone
def raster(states):
    cam_pos, cam_R = jax.vmap(raycast.camera_pose_from_gripper)(
        states.sim.gripper.q, states.cam_t, states.cam_R)
    return raster_pallas.render_batch_pallas(
        states.sim, params, cam_pos, cam_R, states.intrinsics,
        H=env.im_h, W=env.im_w, near=env.near, far=env.far)
t_rast = timeit("raster 64x64 depth+seg", jax.jit(raster), states)

# (c) obs assembly on top of raster
obs_fn = jax.jit(benv.observe_batch)
t_obs = timeit("observe_batch (raster+assemble)", obs_fn, states)

# (d) full step with a fixed action batch
actions = jnp.zeros((B, env.action_dim), jnp.float32)
step = jax.jit(lambda st, c: benv.step(st, actions, c))
t_step = timeit("full benv.step", step, states, cur)

print(f"\nbreakdown: solver {t_solve*1e3:.2f}  obs {t_obs*1e3:.2f}  "
      f"glue(rest) {(t_step-t_solve-t_obs)*1e3:.2f} ms")
