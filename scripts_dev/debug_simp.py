import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_grasp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from deep_rl_grasping_tpu.envs.grasp_env import GraspEnv
from deep_rl_grasping_tpu.sim import physics
from deep_rl_grasping_tpu.utils import config as cfg_util
cfg = cfg_util.load_config('tests/configs/test_simplified_cont.yaml')
cfg['curriculum']['extent'] = [0.0001, 0.0001]
cfg['curriculum']['max_objects'] = [1, 1]
cfg['curriculum']['min_objects'] = [1, 1]
env = GraspEnv(cfg)
lam = jnp.asarray(0.0)
state, obs = jax.jit(lambda k: env.reset(k, lam))(jax.random.PRNGKey(5))
step = jax.jit(lambda s, a: env.step(s, a, lam))
zero = jnp.zeros(3, jnp.float32)
for i in range(60):
    state, obs, r, done, info = step(state, zero)
    q = state.sim.gripper.q
    if i > 40 or bool(done):
        print(f"i={i} z={float(q[2]):.4f} w={float(physics.gripper_width(q)):.4f} obj={np.asarray(state.sim.objects.pos[0]).round(3)} r={float(r)} done={bool(done)} status={int(info['status'])}")
    if bool(done): break
