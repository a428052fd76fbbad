import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_grasp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from deep_rl_grasping_tpu.sim import objects, physics, scene
from deep_rl_grasping_tpu.sim.types import *

lib = objects.get_library(8)
params = make_sim_params(lib, scene_type="OnTable")
TYPE = int(sys.argv[1]) if len(sys.argv)>1 else 576
print('type', TYPE, 'radii', lib.radii[TYPE][lib.radii[TYPE]>0], 'centers', lib.centers[TYPE][lib.radii[TYPE]>0].round(4), 'mass', lib.mass[TYPE])
# place object settled at origin
import jax.random as jr
quat = jnp.array([0.,0.,0.,1.])
R = physics.quat_to_matrix(quat)
local = params.centers[TYPE]
radii = params.radii[TYPE]
wz = jnp.einsum('ij,sj->si', R, local)[:,2]
low = float(jnp.min(jnp.where(radii>0, wz-radii, jnp.inf)))
z0 = params.support_z - low + 1e-4
state = SimState(
    gripper=scene.init_gripper(0.072),
    objects=ObjectState(
        pos=jnp.asarray([[0.,0.,z0]]), quat=quat[None], linvel=jnp.zeros((1,3)),
        angvel=jnp.zeros((1,3)), obj_type=jnp.asarray([TYPE], jnp.int32),
        alive=jnp.asarray([True])),
)
# settle first
state = jax.jit(lambda s: physics.run(s, params, 48))(state)
print('settled obj', np.asarray(state.objects.pos[0]).round(4))
g = state.gripper.replace(finger_target=jnp.asarray(0.05), target=jnp.array([0.,0.,0.072,0.]))
state = state.replace(gripper=g)
run8 = jax.jit(lambda s: physics.run(s, params, 8))
for i in range(12):
    state = run8(state)
    q = state.gripper.q
    print(f"sub {8*(i+1)}: width={float(physics.gripper_width(q)):.4f} obj={np.asarray(state.objects.pos[0]).round(4)} vel={np.asarray(state.objects.linvel[0]).round(3)}")
