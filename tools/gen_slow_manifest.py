#!/usr/bin/env python
"""Regenerate tests/slow_manifest.txt from a `pytest --durations=0` log.

The fast/slow suite split (VERDICT r3 weak #6 / ask #8) is data-driven:
tests whose measured `call` duration exceeds the threshold are listed in
tests/slow_manifest.txt (parametrized ids collapsed to their base nodeid),
and tests/conftest.py marks collected items found there with
`@pytest.mark.slow`. pytest.ini makes `-m "not slow"` the default, so
`python -m pytest tests/ -q` is the fast profile; run the full suite with
`python -m pytest tests/ -q -m "slow or not slow"`.

Usage:
    python -m pytest tests/ -q --durations=0 > /tmp/durations.log
    python tools/gen_slow_manifest.py /tmp/durations.log [threshold_s]

Newly added heavyweight tests that have not been through a duration run
yet can be appended by hand — the manifest is sorted text, one base nodeid
per line, '#' comments allowed.
"""
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    log = Path(argv[1]).read_text()
    threshold = float(argv[2]) if len(argv) > 2 else 8.0
    slow = set()
    for line in log.splitlines():
        m = re.match(r"([\d.]+)s call\s+(\S+)", line)
        if m and float(m.group(1)) >= threshold:
            slow.add(m.group(2).split("[")[0])
    out = REPO / "tests" / "slow_manifest.txt"
    kept = [l for l in out.read_text().splitlines()
            if l.startswith("#")] if out.exists() else []
    header = kept or [
        "# Tests marked slow (deselected by the default fast profile;",
        "# see tools/gen_slow_manifest.py). One base nodeid per line —",
        "# parametrized variants inherit the mark.",
    ]
    out.write_text("\n".join(header + sorted(slow)) + "\n")
    print(f"{len(slow)} slow tests -> {out} (threshold {threshold}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
