"""Scripted-policy probe of the FULL task (OnTable, shaped custom reward).

Checks that a descend->close->lift script run through GraspEnv.step reaches
SUCCESS, i.e. physics, grasp detection, and the reward chain all work in the
full env. Diagnoses the 0%-success sac_full_demo run.
"""
import sys, os
sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
from deep_rl_grasping_tpu.utils import jax_cache
jax_cache.setup()  # CPU runs get a host-fingerprinted cache dir
import jax.numpy as jnp
import numpy as np
from deep_rl_grasping_tpu.envs.grasp_env import GraspEnv
from deep_rl_grasping_tpu.sim import physics

LAM = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
N = int(sys.argv[2]) if len(sys.argv) > 2 else 16
CFG = sys.argv[3] if len(sys.argv) > 3 else 'configs/sac_full_demo.yaml'

env = GraspEnv(CFG)
lam = jnp.asarray(LAM)

@jax.jit
def reset_one(key):
    return env.reset(key, lam)

@jax.jit
def step_one(state, action):
    return env.step(state, action, lam)

def run_episode(seed):
    state, obs = reset_one(jax.random.PRNGKey(seed))
    rows = []
    closed = False
    for t in range(40):
        g = state.sim.gripper
        h = float(g.q[2])
        width = float(physics.gripper_width(g.q))
        # nearest alive object
        alive = np.asarray(state.sim.objects.alive)
        pos = np.asarray(state.sim.objects.pos)
        if alive.any():
            d = np.linalg.norm(pos[alive][:, :2] - np.asarray(g.q[:2]), axis=1)
            tx, ty = pos[alive][np.argmin(d)][:2]
            oz = pos[alive][np.argmin(d)][2]
        else:
            tx = ty = oz = 0.0
        # Hand frame is flipped (roll=pi): local (tx,ty,tz) -> world
        # (tx,-ty,-tz) at yaw=0 (robot.py:251-262). Descend = local +z.
        if not closed:
            yaw = float(g.q[3])
            cy, sy = np.cos(yaw), np.sin(yaw)
            wx, wy = tx - float(g.q[0]), ty - float(g.q[1])
            # invert Rz(yaw): local-frame world-aligned delta
            ldx = cy * wx + sy * wy
            ldy = -(-sy * wx + cy * wy)  # local y flips
            dx = np.clip(ldx / 0.03, -1, 1)
            dy = np.clip(ldy / 0.03, -1, 1)
            near_xy = abs(wx) < 0.005 and abs(wy) < 0.005
            low = h < 0.075  # floor stop is 0.072 (support_z+0.187+0.075)
            if near_xy and low:
                a = np.array([0, 0, 0, 0, -1.0], np.float32)  # close
                closed = True
            else:
                dz = 1.0 if near_xy else 0.0  # local +z = world down
                a = np.array([dx, dy, dz, 0, 0.0], np.float32)
        else:
            a = np.array([0, 0, -1.0, 0, 0.0], np.float32)  # local -z = lift
        state, obs, r, done, info = step_one(state, jnp.asarray(a))
        rows.append((t, h, width, float(r), int(info["status"]), bool(done)))
        if bool(done):
            break
    return rows, int(rows[-1][4])

succ = 0
for seed in range(N):
    rows, status = run_episode(seed)
    tag = {0: "RUN", 1: "SUCCESS", 2: "FAIL", 3: "TIME"}[status]
    print(f"seed {seed}: {tag} after {len(rows)} steps; "
          f"last h={rows[-1][1]:.3f} w={rows[-1][2]:.4f} r={rows[-1][3]:.1f}")
    if status == 1:
        succ += 1
print(f"scripted full-task success: {succ}/{N} at lambda={LAM}")
