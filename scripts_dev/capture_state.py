import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_grasp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np, pickle
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
for i in range(46):
    state, obs, r, done, info = step(state, zero)
sim, cmd = env._apply_action(state.sim, zero)
sim = physics.run(sim, env.sim_params, env.move_substeps)
d = dict(q=np.asarray(sim.gripper.q), target=np.asarray(sim.gripper.target),
         pos=np.asarray(sim.objects.pos), quat=np.asarray(sim.objects.quat),
         obj_type=np.asarray(sim.objects.obj_type), alive=np.asarray(sim.objects.alive))
pickle.dump(d, open('/root/repo/scripts_dev/state46.pkl','wb'))
print('captured', d['q'], d['pos'][0], d['quat'][0])
