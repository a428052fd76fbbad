"""On-chip cycle attribution for the fused solver kernel (VERDICT r3 #4).

Times `solver_pallas.run_batched_sim` with individual pass categories
ablated (the `ablate` switches compile variant kernels whose skipped
sections — and constants DCE'd with them — cost nothing), plus schedule
sweeps of pad_inner_iterations / solver_iterations. The deltas attribute
the kernel's wall time per contact category; results go into
docs/KERNEL_BREAKDOWN.md.

Usage (on the chip):
  python scripts_dev/kernel_breakdown.py [--num_envs 1024] [--substeps 16]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deep_rl_grasping_tpu.utils import jax_cache

jax_cache.setup()

from deep_rl_grasping_tpu.ops import solver_pallas
from deep_rl_grasping_tpu.sim import objects, scene
from deep_rl_grasping_tpu.sim.types import make_sim_params


def make_states(params, B, key):
    lib = objects.get_library(8)
    type_ids = jnp.asarray(lib.random_urdf_ids())
    keys = jax.random.split(key, B)
    return jax.vmap(
        lambda k: scene.reset_scene(
            k, params, type_ids, 5, 1, 5, 0.1, 0.2, settle_substeps=0
        )
    )(keys)


def time_variant(states, params, n_substeps, block_e, label, iters=20,
                 ablate=frozenset(), params_override=None):
    p = params if params_override is None else params_override

    @jax.jit
    def step(s):
        return solver_pallas.run_batched_sim(
            s, p, n_substeps, block_e=block_e, ablate=ablate
        )

    s = step(states)
    s = step(s)
    jax.block_until_ready(s.gripper.q)
    t0 = time.perf_counter()
    s = states
    for _ in range(iters):
        s = step(s)
    jax.block_until_ready(s.gripper.q)
    dt_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:<34} {dt_ms:8.2f} ms/call "
          f"({dt_ms / n_substeps * 1e3:7.1f} us/substep)")
    return dt_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=1024)
    ap.add_argument("--substeps", type=int, default=16)
    ap.add_argument("--block_e", type=int, default=128)
    ap.add_argument("--scene", default="OnFloor")
    args = ap.parse_args()

    lib = objects.get_library(8)
    # flagship schedule dt80it4pad6
    params = make_sim_params(
        lib, scene_type=args.scene, solver_iterations=4,
        pad_inner_iterations=6, dt=1.0 / 80.0,
    )
    states = make_states(params, args.num_envs, jax.random.PRNGKey(0))
    tv = functools.partial(
        time_variant, states, params, args.substeps, args.block_e
    )

    print(f"# kernel breakdown: {args.num_envs} envs x {args.substeps} "
          f"substeps, {args.scene}, dt80it4pad6, block_e={args.block_e}")
    full = tv("full kernel")
    no_oo = tv("- objobj (pass+consts+warm)", ablate=frozenset({"objobj"}))
    no_st = tv("- statics (pass+consts+warm)", ablate=frozenset({"statics"}))
    no_pad = tv("- pads (passes+consts+warm)", ablate=frozenset({"pads"}))
    no_warm = tv("- warm start (all)", ablate=frozenset({"warm"}))
    only_int = tv("- all three categories",
                  ablate=frozenset({"objobj", "statics", "pads"}))
    # Pass-only ablations: geometry/constants/warm start retained, so the
    # delta vs full is the per-solver-iteration solve work alone and
    # (no_X_pass - no_X) is the per-substep geometry+consts+warm cost.
    no_oo_pass = tv("- objobj solve passes only",
                    ablate=frozenset({"objobj_pass"}))
    no_pad_pass = tv("- pad inner passes only",
                     ablate=frozenset({"pads_pass"}))
    no_st_pass = tv("- statics passes only",
                    ablate=frozenset({"statics_pass"}))

    for it in (2, 4):
        for pad in (2, 4, 6):
            p2 = dataclasses.replace(
                params, solver_iterations=it, pad_inner_iterations=pad
            )
            tv(f"schedule it{it}pad{pad}", params_override=p2)

    print("\n# attribution (delta vs full):")
    print(f"  objobj   {full - no_oo:7.2f} ms ({(full - no_oo) / full:5.1%})")
    print(f"  statics  {full - no_st:7.2f} ms ({(full - no_st) / full:5.1%})")
    print(f"  pads     {full - no_pad:7.2f} ms ({(full - no_pad) / full:5.1%})")
    print(f"  warm     {full - no_warm:7.2f} ms ({(full - no_warm) / full:5.1%})")
    print(f"  residual (integrate/motor/geometry) {only_int:7.2f} ms "
          f"({only_int / full:5.1%})")
    print("\n# per-category split (solve passes vs substep-rate "
          "geometry+consts+warm):")
    for name, np_, na in (("objobj", no_oo_pass, no_oo),
                          ("pads", no_pad_pass, no_pad),
                          ("statics", no_st_pass, no_st)):
        print(f"  {name:<8} passes {full - np_:6.2f} ms "
              f"({(full - np_) / full:5.1%})   "
              f"geom+warm {np_ - na:6.2f} ms ({(np_ - na) / full:5.1%})")


if __name__ == "__main__":
    main()
