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
TYPE = 573
state = SimState(
    gripper=scene.init_gripper(0.066),
    objects=ObjectState(pos=jnp.asarray([[0.0144,-0.001,-0.1865]]),
        quat=jnp.asarray([[0.,0.,0.,1.]]),
        linvel=jnp.zeros((1,3)), angvel=jnp.zeros((1,3)),
        obj_type=jnp.asarray([TYPE], jnp.int32), alive=jnp.asarray([True])))
# print sphere world z
c, r, m = physics.world_spheres(state, params)
print('sphere z', np.asarray(c[0,:,2][r[0]>0]).round(4), 'r', np.asarray(r[0][r[0]>0]).round(4))
print('sphere x', np.asarray(c[0,:,0][r[0]>0]).round(4))
g = state.gripper.replace(finger_target=jnp.asarray(0.05), target=jnp.array([0.,0.,0.066,0.]))
state = state.replace(gripper=g)
run4 = jax.jit(lambda s: physics.run(s, params, 4))
for i in range(12):
    state = run4(state)
    q = state.gripper.q
    print(f"sub {4*(i+1)}: w={float(physics.gripper_width(q)):.4f} obj={np.asarray(state.objects.pos[0]).round(4)} v={np.asarray(state.objects.linvel[0]).round(2)}")
