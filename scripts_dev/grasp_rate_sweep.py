import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_grasp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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
        st = physics.run(st, params, int(72*(1/240)/params.dt))
        oxy = st.objects.pos[0,:2]
        g = scene.init_gripper(0.066)
        g = g.replace(q=g.q.at[0].set(oxy[0]).at[1].set(oxy[1]),
                      target=jnp.stack([oxy[0], oxy[1], jnp.asarray(0.066), jnp.asarray(0.0)]))
        st = st.replace(gripper=g)
        st = physics.run(st, params, int(12*(1/240)/params.dt))
        g = st.gripper.replace(finger_target=jnp.asarray(0.05), gripper_close=jnp.asarray(True))
        st = physics.run(st.replace(gripper=g), params, int(48*(1/240)/params.dt))
        g = st.gripper
        st = physics.run(st.replace(gripper=g.replace(target=g.target.at[2].add(0.1))), params, int(96*(1/240)/params.dt))
        width = physics.gripper_width(st.gripper.q)
        lifted = st.objects.pos[0,2] > params.support_z + 0.05
        return (width > 0.005) & lifted
    return jax.jit(jax.vmap(one))

keys = jax.random.split(jax.random.PRNGKey(0), 64)
import itertools
for vmax_f, pom, pin, angd, fr, ws, so, dt in [
    (0.25, 0.4, 14, 1.0, 1.0, 0.9, 8, 1/240),
    (0.25, 0.4, 10, 1.0, 1.0, 0.9, 6, 1/240),
    (0.25, 0.4, 14, 1.0, 1.0, 0.9, 8, 1/120),
    (0.25, 0.4, 10, 1.0, 1.0, 0.9, 6, 1/120),
    (0.25, 0.5, 8, 1.0, 1.0, 0.9, 6, 1/120),
]:
    vm = jnp.array([1.5,1.5,1.5,6.0,vmax_f,vmax_f])
    params = make_sim_params(lib, scene_type="OnFloor", dof_vmax=vm,
        ang_damping=angd, pad_omega=pom, pad_inner_iterations=pin,
        friction=fr, warm_start=ws, solver_iterations=so, dt=dt)
    r = make_runner(params)(keys)
    print(f"pom={pom} pin={pin} so={so} dt={dt:.5f}: rate={float(jnp.mean(r.astype(jnp.float32))):.3f}")
