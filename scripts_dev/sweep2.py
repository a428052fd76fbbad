import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, pickle
from deep_rl_grasping_tpu.sim import objects, physics
from deep_rl_grasping_tpu.sim.types import *
lib = objects.get_library(8)
d = pickle.load(open('/root/repo/scripts_dev/state46.pkl','rb'))

def scenario(params):
    K = d['pos'].shape[0]
    state = SimState(
        gripper=GripperState(q=jnp.asarray(d['q']), qd=jnp.zeros(6),
            target=jnp.asarray(d['target']),
            finger_target=jnp.asarray(0.05), gripper_close=jnp.asarray(True), ee_angle=jnp.asarray(0.)),
        objects=ObjectState(pos=jnp.asarray(d['pos']), quat=jnp.asarray(d['quat']),
            linvel=jnp.zeros((K,3)), angvel=jnp.zeros((K,3)),
            obj_type=jnp.asarray(d['obj_type']), alive=jnp.asarray(d['alive'])))
    st = physics.run(state, params, 48)
    w_c = float(physics.gripper_width(st.gripper.q)); oc = np.asarray(st.objects.pos[0])
    g = st.gripper
    st = physics.run(st.replace(gripper=g.replace(target=g.target.at[2].add(0.05))), params, 48)
    w_l = float(physics.gripper_width(st.gripper.q)); ol = np.asarray(st.objects.pos[0])
    return w_c, oc.round(3), w_l, ol.round(3), (w_l > 0.005) and ol[2] > -0.17

import itertools
for vmax_f, angd, pom, pin in [
    (0.35, 1.0, 0.9, 4), (0.25, 1.0, 0.7, 6), (0.2, 2.0, 0.7, 6),
    (0.25, 2.0, 0.5, 8), (0.3, 0.04, 0.7, 6), (0.25, 1.0, 0.9, 4)]:
    vm = jnp.array([1.5,1.5,1.5,6.0,vmax_f,vmax_f])
    params = make_sim_params(lib, scene_type="OnFloor", dof_vmax=vm,
        ang_damping=angd, pad_omega=pom, pad_inner_iterations=pin)
    w_c, oc, w_l, ol, ok = scenario(params)
    print(f"vmax={vmax_f} angd={angd} pom={pom} pin={pin}: close w={w_c:.4f} {oc} lift w={w_l:.4f} {ol} HELD={ok}")
