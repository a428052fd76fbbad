import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from deep_rl_grasping_tpu.sim import objects, physics, scene
from deep_rl_grasping_tpu.sim.types import *
lib = objects.get_library(8)
params = make_sim_params(lib, scene_type="OnFloor")
TYPE = 573
# state mid-squeeze: fingers at f=0.035 (w=0.03), chain pinned
q = jnp.array([0.,0.,0.066,0.,0.035,0.035])
state = SimState(
    gripper=GripperState(q=q, qd=jnp.zeros(6), target=jnp.array([0.,0.,0.066,0.]),
        finger_target=jnp.asarray(0.05), gripper_close=jnp.asarray(True), ee_angle=jnp.asarray(0.)),
    objects=ObjectState(pos=jnp.asarray([[-0.013,-0.001,-0.1865]]),
        quat=jnp.asarray([[0.,0.,0.,1.]]),
        linvel=jnp.zeros((1,3)), angvel=jnp.zeros((1,3)),
        obj_type=jnp.asarray([TYPE], jnp.int32), alive=jnp.asarray([True])))
c, r, m = physics.world_spheres(state, params)
print('sphere x', np.asarray(c[0,:,0][r[0]>0]).round(4))
base, Rg, pads, axes = physics.pad_frames(q)
print('pad centers x', np.asarray(pads[:,0]), 'inner faces', np.asarray(pads[:,0]) - np.array([-0.01, 0.01])*-1)
contacts = physics._collect_contacts(state, params)
act = np.asarray(contacts['active'])
bk = np.asarray(contacts['b_kind'])
print('active static:', act[:40].sum(), 'padL:', act[40:80].sum(), 'padR:', act[80:120].sum())
for i in range(40,120):
    if act[i]:
        print('contact', i, 'b_kind', bk[i], 'n', np.asarray(contacts['normal'][i]).round(3), 'pen', float(contacts['pen'][i]), 'pt', np.asarray(contacts['point'][i]).round(4))
# run one substep and see qd
ns, lams = physics.substep(state, params)
print('qd after substep', np.asarray(ns.gripper.qd).round(4))
print('obj v', np.asarray(ns.objects.linvel[0]).round(3))
