"""Summarize the round-4 TPU measurement queue logs (/tmp/r4_*.log).

Prints one line per step: name, rc marker from the queue log if present,
and the last few informative lines (numbers) from each step log. Used to
harvest measured numbers into README/CLAUDE.md after scripts/r4_measure.sh
completes.
"""

from __future__ import annotations

import glob
import os
import re

INTERESTING = re.compile(
    r"(img/s|tok/s|ms/step|ms\b.*MFU|MFU|rows/s|accept|OK|ms/batch|"
    r"median|rel err|\d+\.\d+e[+-]\d+|img/sec|tokens/s)",
    re.IGNORECASE,
)


def main() -> None:
    logs = sorted(glob.glob("/tmp/r4_*.log"))
    for path in logs:
        name = os.path.basename(path)[3:-4]
        if name == "queue":
            continue
        with open(path, errors="replace") as f:
            lines = [ln.rstrip() for ln in f if ln.strip()]
        hits = [ln for ln in lines if INTERESTING.search(ln)][-8:]
        print(f"== {name} ({len(lines)} lines)")
        for ln in hits or lines[-3:]:
            print(f"   {ln}")
    qlog = "/tmp/r4_queue.log"
    if os.path.exists(qlog):
        with open(qlog, errors="replace") as f:
            rcs = [ln.strip() for ln in f if ln.startswith("rc=")]
        print("== queue rc:", "; ".join(rcs) or "(none yet)")


if __name__ == "__main__":
    main()
