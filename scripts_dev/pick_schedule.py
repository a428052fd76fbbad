"""Pick the cheapest physics schedule that passed the fidelity gate.

Reads the physics_cost_sweep.py output log and prints the variant key
(first token of the line) with the LOWEST step time among variants whose
scripted-expert success rate is >= 99% at BOTH lambda=0 and lambda=1 with
at least --min-ep finished episodes each. Prints "default" if none pass
(or only the default does).

Usage: python scripts_dev/pick_schedule.py /tmp/queue_sweep.log
"""
import argparse
import re
import sys

p = argparse.ArgumentParser()
p.add_argument("log")
p.add_argument("--min-rate", type=float, default=99.0)
p.add_argument("--min-ep", type=int, default=50)
args = p.parse_args()

LINE = re.compile(
    r"^(\S+)\s.*step\s+([\d.]+) ms.*"
    r"lam0\s+([\d.]+)% \((\d+) ep\)\s+lam1\s+([\d.]+)% \((\d+) ep\)"
)

best_name, best_ms = "default", float("inf")
try:
    with open(args.log) as f:
        for raw in f:
            m = LINE.match(raw.strip())
            if not m:
                continue
            name, ms, r0, n0, r1, n1 = (
                m.group(1), float(m.group(2)), float(m.group(3)),
                int(m.group(4)), float(m.group(5)), int(m.group(6)),
            )
            if name == "default":
                continue
            if (r0 >= args.min_rate and r1 >= args.min_rate
                    and n0 >= args.min_ep and n1 >= args.min_ep
                    and ms < best_ms):
                best_name, best_ms = name, ms
except OSError as e:
    print("default")
    print(f"pick_schedule: {e}", file=sys.stderr)
    sys.exit(0)

print(best_name)
