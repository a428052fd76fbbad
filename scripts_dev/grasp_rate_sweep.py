import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
from deep_rl_grasping_tpu.utils import jax_cache
jax_cache.setup()  # CPU runs get a host-fingerprinted cache dir
import jax.numpy as jnp, numpy as np
from deep_rl_grasping_tpu.sim import objects, physics, scene
from deep_rl_grasping_tpu.sim.types import *
from deep_rl_grasping_tpu.utils import transforms
lib = objects.get_library(8)

def make_runner(params):
    def one(key):
        kt, kq = jax.random.split(key)
        T = jax.random.randint(kt, (), 6, 1006)
        quat = transforms.random_quaternion(jax.random.uniform(kq, (3,)))
        R = physics.quat_to_matrix(quat)
        local = params.centers[T]; radii = params.radii[T]
        wz = jnp.einsum('ij,sj->si', R, local)[:,2]
        low = jnp.min(jnp.where(radii>0, wz-radii, jnp.inf))
        z0 = params.support_z - low + 1e-4
        st = SimState(
            gripper=scene.init_gripper(1.0),
            objects=ObjectState(pos=jnp.stack([0.0, 0.0, z0])[None],
                quat=quat[None], linvel=jnp.zeros((1,3)), angvel=jnp.zeros((1,3)),
                obj_type=T[None].astype(jnp.int32), alive=jnp.asarray([True])))
        st = physics.run(st, params, 72)
        oxy = st.objects.pos[0,:2]
        g = scene.init_gripper(0.066)
        g = g.replace(q=g.q.at[0].set(oxy[0]).at[1].set(oxy[1]),
                      target=jnp.stack([oxy[0], oxy[1], jnp.asarray(0.066), jnp.asarray(0.0)]))
        st = st.replace(gripper=g)
        st = physics.run(st, params, 12)
        g = st.gripper.replace(finger_target=jnp.asarray(0.05), gripper_close=jnp.asarray(True))
        st = physics.run(st.replace(gripper=g), params, 48)
        g = st.gripper
        st = physics.run(st.replace(gripper=g.replace(target=g.target.at[2].add(0.1))), params, 96)
        width = physics.gripper_width(st.gripper.q)
        lifted = st.objects.pos[0,2] > params.support_z + 0.05
        return (width > 0.005) & lifted
    return jax.jit(jax.vmap(one))

keys = jax.random.split(jax.random.PRNGKey(0), 64)
for ws, pin, pom, ff in [(0.95, 14, 0.4, 50.0), (0.95, 16, 0.4, 50.0)]:
    params = make_sim_params(lib, scene_type="OnFloor", warm_start=ws,
        pad_inner_iterations=pin, pad_omega=pom,
        dof_force=jnp.array([100.,100.,100.,20.,ff,ff]))
    r = make_runner(params)(keys)
    print(f"ws={ws} pin={pin} pom={pom} F={ff}: rate={float(jnp.mean(r.astype(jnp.float32))):.3f}")
