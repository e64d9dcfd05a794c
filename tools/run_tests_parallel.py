#!/usr/bin/env python
"""Shard the pytest suite across parallel processes (no pytest-xdist in
this container).  Each shard is a separate pytest process with its own
local[4] SparkSession, so N shards use ~4N cores — the full suite drops
from ~14 min serial to ~3 min at -n 6 on the 32-core box.

Sharding is by test FILE (session-scoped Spark fixtures stay valid),
greedily balanced by file size as a duration proxy.  Exit code is
non-zero if any shard fails; each shard's tail is printed on failure.

Usage:
    python tools/run_tests_parallel.py            # -n 6 shards
    python tools/run_tests_parallel.py -n 4 -k expr
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=6, help="number of shards")
    ap.add_argument("-k", default=None, help="pytest -k expression")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tests_dir = os.path.join(root, "tests")
    files = sorted(
        f
        for f in os.listdir(tests_dir)
        if f.startswith("test_") and f.endswith(".py")
    )
    # greedy longest-processing-time balance on file size
    sized = sorted(
        ((os.path.getsize(os.path.join(tests_dir, f)), f) for f in files),
        reverse=True,
    )
    shards: list[list[str]] = [[] for _ in range(args.n)]
    loads = [0] * args.n
    for size, f in sized:
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += size

    t0 = time.time()
    procs = []
    for i, shard in enumerate(shards):
        if not shard:
            continue
        cmd = [sys.executable, "-m", "pytest", "-q", "--no-header"] + [
            os.path.join("tests", f) for f in shard
        ]
        if args.k:
            cmd += ["-k", args.k]
        log = tempfile.NamedTemporaryFile(
            mode="w+", suffix=f".shard{i}.log", delete=False
        )
        procs.append(
            (
                i,
                subprocess.Popen(
                    cmd, cwd=root, stdout=log, stderr=subprocess.STDOUT
                ),
                log,
            )
        )

    failed = False
    for i, p, log in procs:
        rc = p.wait()
        log.flush()
        log.seek(0)
        tail = log.read().strip().splitlines()
        summary = tail[-1] if tail else "(no output)"
        # pytest exits 5 when a -k filter deselects everything in a shard
        ok = rc == 0 or (rc == 5 and args.k)
        print(f"shard {i}: rc={rc} {summary}")
        if not ok:
            failed = True
            print("\n".join(tail[-30:]))
        os.unlink(log.name)
    print(f"total wall: {time.time() - t0:.1f}s across {args.n} shards")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
