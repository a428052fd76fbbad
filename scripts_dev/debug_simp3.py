import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_grasp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from deep_rl_grasping_tpu.envs.grasp_env import GraspEnv
from deep_rl_grasping_tpu.sim import physics
from deep_rl_grasping_tpu.sim.types import FINGER_CLOSED
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
# now replicate _step_core manually with prints
sim, cmd = env._apply_action(state.sim, zero)
sim = physics.run(sim, env.sim_params, env.move_substeps)
h = float(sim.gripper.q[2])
t = int(sim.objects.obj_type[0])
lib = env.library
print('h after move', h, 'trigger', h < 0.07, 'objtype', t, 'radii', lib.radii[t][lib.radii[t]>0])
print('obj pos', np.asarray(sim.objects.pos[0]).round(4))
g = sim.gripper
g = g.replace(finger_target=jnp.where(h<0.07, FINGER_CLOSED, g.finger_target), gripper_close=g.gripper_close | (h<0.07))
sim = physics.run(sim.replace(gripper=g), env.sim_params, env.gripper_substeps)
print('after close: w', float(physics.gripper_width(sim.gripper.q)), 'obj', np.asarray(sim.objects.pos[0]).round(4))
g = sim.gripper
lift_target = g.target.at[2].add(0.05)
sim = physics.run(sim.replace(gripper=g.replace(target=lift_target)), env.sim_params, 2*env.move_substeps)
print('after lift: z', float(sim.gripper.q[2]), 'w', float(physics.gripper_width(sim.gripper.q)), 'obj', np.asarray(sim.objects.pos[0]).round(4))
print('detected', bool(env.object_detected(sim)))
