import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, pickle
from deep_rl_grasping_tpu.sim import objects, physics
from deep_rl_grasping_tpu.sim.types import *
lib = objects.get_library(8)
params = make_sim_params(lib, scene_type="OnFloor")
d = pickle.load(open('/root/repo/scripts_dev/state46.pkl','rb'))
K = d['pos'].shape[0]
state = SimState(
    gripper=GripperState(q=jnp.asarray(d['q']), qd=jnp.zeros(6),
        target=jnp.asarray(d['target']),
        finger_target=jnp.asarray(0.05), gripper_close=jnp.asarray(True), ee_angle=jnp.asarray(0.)),
    objects=ObjectState(pos=jnp.asarray(d['pos']), quat=jnp.asarray(d['quat']),
        linvel=jnp.zeros((K,3)), angvel=jnp.zeros((K,3)),
        obj_type=jnp.asarray(d['obj_type']), alive=jnp.asarray(d['alive'])))
c, r, m = physics.world_spheres(state, params)
print('sphere pos', np.asarray(c[0][r[0]>0]).round(4))
st = state; lams = None
for i in range(24):
    st, lams = physics.substep(st, params, lams)
    o = st.objects
    print(f"{i}: w={float(physics.gripper_width(st.gripper.q)):.4f} p={np.asarray(o.pos[0]).round(4)} v={np.asarray(o.linvel[0]).round(2)} av={np.asarray(o.angvel[0]).round(1)}")
