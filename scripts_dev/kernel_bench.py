"""Microbench the fused solver kernel on the real TPU.

Measures ms per n_substeps-run of solver_pallas.run_batched_sim on the
full-task (OnTable) scene at several (batch, block_e) points, to pick the
production block size and quantify kernel-level optimizations (e.g. the
substep-invariant hoisting). Run only when the chip is free.

Usage: python scripts_dev/kernel_bench.py [--batch 4096] [--substeps 48]
"""
import sys, os, time, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from deep_rl_grasping_tpu.utils import jax_cache
jax_cache.setup()  # CPU runs get a host-fingerprinted cache dir

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=4096)
p.add_argument("--substeps", type=int, default=48)
p.add_argument("--blocks", type=str, default="128,256,512")
p.add_argument("--iters", type=int, default=20)
p.add_argument("--scene", type=str, default="OnTable")
args = p.parse_args()

from deep_rl_grasping_tpu.ops import solver_pallas
from deep_rl_grasping_tpu.sim import objects as objlib, scene
from deep_rl_grasping_tpu.sim.types import SimState, make_sim_params

lib = objlib.get_library(8)
params = make_sim_params(lib, scene_type=args.scene)
B = args.batch


def make_states(key):
    def one(k):
        objs = scene.sample_objects(
            k, params, jnp.arange(6, 106, dtype=jnp.int32), 3, 3, 5,
            jnp.asarray(0.1),
        )
        g = scene.init_gripper(0.25)
        return SimState(gripper=g, objects=objs)
    return jax.vmap(one)(jax.random.split(key, B))


states = jax.jit(make_states)(jax.random.PRNGKey(0))
for be in [int(x) for x in args.blocks.split(",")]:
    if B % be:
        continue
    run = jax.jit(
        lambda s: solver_pallas.run_batched_sim(s, params, args.substeps,
                                                block_e=be)
    )
    try:
        out = run(states)
        jax.block_until_ready(out.gripper.q)
    except Exception as e:
        print(f"block_e={be}: FAILED {type(e).__name__}: {str(e)[:200]}")
        continue
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run(out)
    jax.block_until_ready(out.gripper.q)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"block_e={be}: {dt*1e3:.1f} ms per {args.substeps}-substep run "
          f"@ B={B} -> {B/dt:.0f} env ctrl-steps/s", flush=True)
