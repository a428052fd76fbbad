import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, pickle
from deep_rl_grasping_tpu.sim import objects, physics
from deep_rl_grasping_tpu.sim.types import *
import dataclasses
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
    st = physics.run(state, params, 48)  # close
    w_close = float(physics.gripper_width(st.gripper.q))
    o_close = np.asarray(st.objects.pos[0])
    g = st.gripper
    st = physics.run(st.replace(gripper=g.replace(target=g.target.at[2].add(0.05))), params, 48)
    w_lift = float(physics.gripper_width(st.gripper.q))
    o_lift = np.asarray(st.objects.pos[0])
    detected = w_lift > 0.005
    return w_close, o_close.round(3), w_lift, o_lift.round(3), detected

for ws, pin, om_in in [(0.9,4,0.9),(0.8,4,0.6),(0.5,6,0.6),(0.9,2,0.5),(0.7,8,0.5),(0.5,8,0.4)]:
    params = make_sim_params(lib, scene_type="OnFloor", warm_start=ws, pad_inner_iterations=pin)
    # patch omega for pads via module constant? om_in is hardcoded 0.9 in physics; emulate via global
    import deep_rl_grasping_tpu.sim.physics as ph
    src_om = om_in
    # monkeypatch: recompile not trivial; instead we temporarily modify the module attribute if present
    w_c, o_c, w_l, o_l, det = scenario(params)
    print(f"ws={ws} inner={pin}: close w={w_c:.4f} obj={o_c}  lift w={w_l:.4f} obj={o_l} detected={det}")
