"""Pick the fastest solver-kernel block_e from a kernel_bench.py log.

Prints the winning block size, or 128 (the default) if no block beats it
by more than 3% (not worth a config delta inside noise).

Usage: python scripts_dev/pick_block.py /tmp/queue_kernel.log
"""
import re
import sys

LINE = re.compile(r"^block_e=(\d+): ([\d.]+) ms")

times = {}
try:
    with open(sys.argv[1]) as f:
        for raw in f:
            m = LINE.match(raw.strip())
            if m:
                times[int(m.group(1))] = float(m.group(2))
except (OSError, IndexError):
    print(128)
    sys.exit(0)

if not times:
    print(128)
    sys.exit(0)
base = times.get(128, float("inf"))
best = min(times, key=times.get)
print(best if times[best] < 0.97 * base else 128)
