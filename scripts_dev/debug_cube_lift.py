import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_grasp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from deep_rl_grasping_tpu.sim import objects, physics, scene
from deep_rl_grasping_tpu.sim.types import *
lib = objects.get_library(8)
params = make_sim_params(lib, scene_type="OnFloor")
CUBE=1
r = float(lib.radii[CUBE].max())
z_obj = params.support_z + r
h = z_obj + 0.19
print('floor clamp min h:', params.support_z + 0.262, 'test h:', h)
state = SimState(
    gripper=scene.init_gripper(h),
    objects=ObjectState(pos=jnp.asarray([[0.,0.,z_obj]]), quat=jnp.asarray([[0.,0.,0.,1.]]),
        linvel=jnp.zeros((1,3)), angvel=jnp.zeros((1,3)),
        obj_type=jnp.asarray([CUBE], jnp.int32), alive=jnp.asarray([True])))
g = state.gripper.replace(target=jnp.array([0.,0.,h,0.]), finger_target=jnp.asarray(0.05))
state = state.replace(gripper=g)
state = jax.jit(lambda s: physics.run(s, params, 48))(state)
print('after close: h', float(state.gripper.q[2]), 'w', float(physics.gripper_width(state.gripper.q)), 'obj', np.asarray(state.objects.pos[0]).round(4))
run24 = jax.jit(lambda s: physics.run(s, params, 24))
for i in range(8):
    g = state.gripper.replace(target=state.gripper.target.at[2].add(0.02))
    state = run24(state.replace(gripper=g))
    print(f'lift {i}: h={float(state.gripper.q[2]):.4f} w={float(physics.gripper_width(state.gripper.q)):.4f} obj={np.asarray(state.objects.pos[0]).round(4)}')
