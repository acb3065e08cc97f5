"""Regenerate tests/slow_manifest.txt from a `pytest --durations=0` log.

Usage:  python -m pytest tests/ -q --durations=0 --runslow > /tmp/dur.log
        python tests/gen_slow_manifest.py /tmp/dur.log [threshold_s]
"""
import re
import sys

log = sys.argv[1]
thr = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
calls = []
for line in open(log):
    m = re.match(r"([\d.]+)s call\s+(\S+)", line)
    if m:
        calls.append((float(m.group(1)), m.group(2)))
slow = sorted(n for t, n in calls if t >= thr)
out = __file__.replace("gen_slow_manifest.py", "slow_manifest.txt")
with open(out, "w") as f:
    f.write(f"# Tests measured >= {thr:g} s of call time (pytest "
            "--durations=0).\n# The default tier skips these; `pytest "
            "tests/ -q --runslow` executes ALL\n# tests (zero coverage "
            "loss across the two tiers).\n"
            "# Regenerate: python tests/gen_slow_manifest.py "
            "<durations-log>\n")
    for n in slow:
        f.write(n + "\n")
print(f"{len(slow)} tests -> {out}")
