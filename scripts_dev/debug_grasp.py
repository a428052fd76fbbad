import os, sys
sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_grasp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from deep_rl_grasping_tpu.envs.grasp_env import GraspEnv
from deep_rl_grasping_tpu.sim import physics
from deep_rl_grasping_tpu.utils import config as cfg_util

cfg = cfg_util.load_config('tests/configs/test_continuous.yaml')
cfg['curriculum']['extent'] = [0.0001, 0.0001]
cfg['curriculum']['max_objects'] = [1, 1]
cfg['curriculum']['min_objects'] = [1, 1]
env = GraspEnv(cfg)
lam = jnp.asarray(0.0)
state, obs = jax.jit(lambda k: env.reset(k, lam))(jax.random.PRNGKey(3))
step = jax.jit(lambda s, a: env.step(s, a, lam))
def report(tag):
    q = state.sim.gripper.q
    o = state.sim.objects
    print(f"{tag}: grip z={float(q[2]):.4f} width={float(physics.gripper_width(q)):.4f} ft={float(state.sim.gripper.finger_target)} obj0 pos={np.asarray(o.pos[0]).round(4)} alive={np.asarray(o.alive)} type={np.asarray(o.obj_type)}", flush=True)
report('reset')
descend = jnp.array([0.,0.,1.,0.,1.], jnp.float32)
for i in range(11):
    state, obs, r, done, info = step(state, descend)
    report(f'descend {i} r={float(r):.1f} done={bool(done)}')
close = jnp.array([0.,0.,0.,0.,-1.], jnp.float32)
state, obs, r, done, info = step(state, close)
report('close')
print('detected', bool(env.object_detected(state.sim)))
lift = jnp.array([0.,0.,-1.,0.,0.], jnp.float32)
for i in range(6):
    state, obs, r, done, info = step(state, lift)
    report(f'lift {i} r={float(r):.1f} done={bool(done)} succ={bool(info["is_success"])}')
