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
# sphere-ish object at x=0.019 as in the failing case
TYPE = 700
print('radii', lib.radii[TYPE][lib.radii[TYPE]>0])
quat = jnp.array([0.,0.,0.,1.])
wz = jnp.einsum('ij,sj->si', physics.quat_to_matrix(quat), params.centers[TYPE])[:,2]
low = float(jnp.min(jnp.where(params.radii[TYPE]>0, wz-params.radii[TYPE], jnp.inf)))
z0 = params.support_z - low + 1e-4
state = SimState(
    gripper=scene.init_gripper(0.0655),
    objects=ObjectState(pos=jnp.asarray([[0.019,0.,z0]]), quat=quat[None],
        linvel=jnp.zeros((1,3)), angvel=jnp.zeros((1,3)),
        obj_type=jnp.asarray([TYPE], jnp.int32), alive=jnp.asarray([True])))
state = jax.jit(lambda s: physics.run(s, params, 24))(state)
print('pre-close: z', float(state.gripper.q[2]), 'obj', np.asarray(state.objects.pos[0]).round(4))
g = state.gripper.replace(finger_target=jnp.asarray(0.05))
state = state.replace(gripper=g)
run8 = jax.jit(lambda s: physics.run(s, params, 8))
for i in range(6):
    state = run8(state)
    print(f'close {8*(i+1)}: w={float(physics.gripper_width(state.gripper.q)):.4f} obj={np.asarray(state.objects.pos[0]).round(4)}')
# lift
g = state.gripper.replace(target=state.gripper.target.at[2].add(0.05))
state = state.replace(gripper=g)
for i in range(6):
    state = run8(state)
    print(f'lift {8*(i+1)}: z={float(state.gripper.q[2]):.4f} w={float(physics.gripper_width(state.gripper.q)):.4f} obj={np.asarray(state.objects.pos[0]).round(4)}')
