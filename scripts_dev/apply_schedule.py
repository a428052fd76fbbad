"""Apply a fidelity-gated physics schedule to config files' tpu blocks.

The schedule keys (dt / substeps / solver iterations / pad iterations) are
the sweep variants from scripts_dev/physics_cost_sweep.py. Editing is
line-level inside the `tpu:` block so YAML comments elsewhere survive;
works both on hand-written configs and on resolved run-dir snapshots.

Usage:
  python scripts_dev/apply_schedule.py dt120it6pad8            # default file set
  python scripts_dev/apply_schedule.py dt120it6pad8 --files a.yaml b.yaml
  python scripts_dev/apply_schedule.py revert                  # back to code defaults
"""
import argparse
import re
import sys

SCHEDULES = {
    # keep in sync with scripts_dev/physics_cost_sweep.py VARIANTS
    "pad8": {"pad_inner_iterations": 8},
    "it6pad8": {"solver_iterations": 6, "pad_inner_iterations": 8},
    "it4pad8": {"solver_iterations": 4, "pad_inner_iterations": 8},
    "dt120": {"dt": 1.0 / 120.0, "gripper_substeps": 24, "move_substeps": 12},
    "dt120it6pad8": {"dt": 1.0 / 120.0, "gripper_substeps": 24,
                     "move_substeps": 12, "solver_iterations": 6,
                     "pad_inner_iterations": 8},
    "dt120it4pad6": {"dt": 1.0 / 120.0, "gripper_substeps": 24,
                     "move_substeps": 12, "solver_iterations": 4,
                     "pad_inner_iterations": 6},
    "dt80it6pad8": {"dt": 1.0 / 80.0, "gripper_substeps": 16,
                    "move_substeps": 8, "solver_iterations": 6,
                    "pad_inner_iterations": 8},
    "dt80it4pad6": {"dt": 1.0 / 80.0, "gripper_substeps": 16,
                    "move_substeps": 8, "solver_iterations": 4,
                    "pad_inner_iterations": 6},
    "dt80it2pad4": {"dt": 1.0 / 80.0, "gripper_substeps": 16,
                    "move_substeps": 8, "solver_iterations": 2,
                    "pad_inner_iterations": 4},
    "dt40it6pad8": {"dt": 1.0 / 40.0, "gripper_substeps": 8,
                    "move_substeps": 4, "solver_iterations": 6,
                    "pad_inner_iterations": 8},
    "dt40it4pad6": {"dt": 1.0 / 40.0, "gripper_substeps": 8,
                    "move_substeps": 4, "solver_iterations": 4,
                    "pad_inner_iterations": 6},
    "dt40it2pad4": {"dt": 1.0 / 40.0, "gripper_substeps": 8,
                    "move_substeps": 4, "solver_iterations": 2,
                    "pad_inner_iterations": 4},
    "revert": {},
}
SCHED_KEYS = {"dt", "gripper_substeps", "move_substeps",
              "solver_iterations", "pad_inner_iterations", "block_e"}
KEY_ORDER = ("dt", "gripper_substeps", "move_substeps",
             "solver_iterations", "pad_inner_iterations", "block_e")

DEFAULT_FILES = [
    "configs/gripper_grasp.yaml",
    "configs/sac_full_flagship.yaml",
    "configs/sac_rgbd_flagship.yaml",
    "configs/sac_table_clearing.yaml",
]


def apply_to_file(path, variant, overrides):
    with open(path) as f:
        lines = f.readlines()
    out, i, n, found = [], 0, len(lines), False
    while i < n:
        line = lines[i]
        out.append(line)
        i += 1
        if re.match(r"^tpu:\s*(#.*)?$", line):
            found = True
            if overrides:
                out.append("  # physics schedule '%s' — auto-applied after "
                           "the on-chip fidelity sweep\n" % variant)
                for k in KEY_ORDER:
                    if k in overrides:
                        v = overrides[k]
                        out.append("  %s: %s\n" % (k, repr(v) if isinstance(v, float) else v))
            # copy the rest of the block, dropping old schedule keys and
            # a previously applied schedule comment
            while i < n:
                b = lines[i]
                if b.strip() and not b.startswith((" ", "\t")):
                    break  # next top-level key
                key = b.split(":")[0].strip().lstrip("#").strip()
                is_old_comment = b.lstrip().startswith("# physics schedule '")
                if not (key in SCHED_KEYS or is_old_comment):
                    out.append(b)
                i += 1
    if not found:
        print(f"{path}: no tpu block, skipped", file=sys.stderr)
        return False
    with open(path, "w") as f:
        f.writelines(out)
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("variant", choices=sorted(SCHEDULES))
    p.add_argument("--files", nargs="+", default=DEFAULT_FILES)
    p.add_argument("--extra", nargs="*", default=[],
                   help="extra tpu keys, e.g. block_e=256")
    args = p.parse_args()
    ov = dict(SCHEDULES[args.variant])
    for kv in args.extra:
        k, v = kv.split("=", 1)
        if k not in SCHED_KEYS:
            sys.exit(f"unknown extra key {k}")
        ov[k] = float(v) if "." in v else int(v)
    for path in args.files:
        if apply_to_file(path, args.variant, ov):
            print(f"{path}: schedule -> {args.variant or 'defaults'}")


if __name__ == "__main__":
    main()
