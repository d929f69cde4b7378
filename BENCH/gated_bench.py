#!/usr/bin/env python
"""Clean-window bench capture (round-4 bookkeeping item).

Probes the host's fresh-page allocation bandwidth (bench.alloc_gbps —
the round-3 forensics isolated THIS path, not steady-state memcpy, as
what co-tenant slams collapse ~250x) once a minute and launches the
full bench the moment a window opens. Because round 3's watcher ran
6+ hours without ever seeing the 3 GB/s "clean" bar, the gate decays:
after --fallback-min minutes the bar drops to --fallback-gbps, so the
artifact records the BEST window the host offered rather than nothing.
bench.py stamps alloc_gbps_pre/post itself, so the recorded JSON is
self-describing about the regime it ran in.

Usage:
    python BENCH/gated_bench.py --out BENCH/bench_r04_gated.json
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate-gbps", type=float, default=3.0)
    ap.add_argument("--fallback-gbps", type=float, default=1.5)
    ap.add_argument("--fallback-min", type=float, default=60)
    ap.add_argument("--max-min", type=float, default=150)
    ap.add_argument("--interval-sec", type=float, default=60)
    ap.add_argument("--out", default="BENCH/bench_r04_gated.json")
    args = ap.parse_args()

    from bench import alloc_gbps

    start = time.monotonic()
    while True:
        mins = (time.monotonic() - start) / 60
        gate = args.gate_gbps if mins < args.fallback_min else args.fallback_gbps
        bw = alloc_gbps()
        load = os.getloadavg()[0]
        print(
            f"{time.strftime('%H:%M:%S')} probe bw={bw:.2f}GB/s load={load:.2f} "
            f"gate={gate} elapsed={mins:.0f}m",
            flush=True,
        )
        if bw >= gate and load < 4.0:
            break
        if mins > args.max_min:
            print("budget exhausted; running at whatever the host gives", flush=True)
            break
        time.sleep(args.interval_sec)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(args.out, "w") as f:
        rc = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            stdout=f,
            stderr=open(args.out.replace(".json", ".log"), "w"),
            cwd=repo,
        ).returncode
    print(f"bench exit={rc} -> {args.out}", flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
