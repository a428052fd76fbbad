import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_grasp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from deep_rl_grasping_tpu.envs.grasp_env import GraspEnv
from deep_rl_grasping_tpu.sim import physics
from deep_rl_grasping_tpu.utils import config as cfg_util
cfg = cfg_util.load_config("tests/configs/test_continuous.yaml")
cfg["curriculum"]["extent"] = [0.02, 0.02]
cfg["curriculum"]["max_objects"] = [2, 2]
cfg["curriculum"]["min_objects"] = [2, 2]
cfg["reward"].update(custom=True, table_clearing=True, terminal_reward=100.0,
    lift_success=10.0, time_penalty=1.0, shaped=True)
env = GraspEnv(cfg)
lam = jnp.asarray(0.0)
state, obs = jax.jit(lambda k: env.reset(k, lam))(jax.random.PRNGKey(0))
step = jax.jit(lambda s, a: env.step(s, a, lam))
close = jnp.array([0.,0.,0.,0.,-1.], jnp.float32)
lift = jnp.array([0.,0.,-1.,0.,0.], jnp.float32)
for i in range(18):
    obj = state.sim.objects
    z = jnp.where(obj.alive, obj.pos[:,2], -jnp.inf)
    target_xy = obj.pos[jnp.argmax(z), :2]
    q = state.sim.gripper.q
    err = np.asarray(target_xy - q[:2])
    a = np.zeros(5, np.float32)
    a[0] = np.clip(err[0]/0.01, -1, 1)
    a[1] = np.clip(-err[1]/0.01, -1, 1)
    a[2] = 1.0 if float(q[2]) > 0.0735 else 0.0
    a[4] = 1.0
    state, obs, r, done, info = step(state, jnp.asarray(a))
    if float(state.sim.gripper.q[2]) <= 0.0735 and np.linalg.norm(err) < 0.004:
        break
q = state.sim.gripper.q
print('pre-close: h', float(q[2]), 'xy', np.asarray(q[:2]).round(4), 'objs', np.asarray(state.sim.objects.pos).round(3))
state, obs, r, done, info = step(state, close)
print('post-close: w', float(physics.gripper_width(state.sim.gripper.q)), 'detected', bool(env.object_detected(state.sim)))
for i in range(12):
    state, obs, r, done, info = step(state, lift)
    n_now = int(jnp.sum(state.sim.objects.alive.astype(jnp.int32)))
    print(f'lift {i}: h={float(state.sim.gripper.q[2]):.3f} w={float(physics.gripper_width(state.sim.gripper.q)):.4f} alive={n_now} r={float(r):.1f} done={bool(done)}')
