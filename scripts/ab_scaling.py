#!/usr/bin/env python
"""A/B the write-path tuning knobs at one parallelism level.

Generates one log, then runs the bench_scaling worker as a subprocess
once per (level, SPARK_GRAFT_TUNE) combination, printing each
WORKER_RESULT tagged with its config. Used to isolate which r3 knobs
help / hurt which level on this host (results in BENCH/BASELINE.md).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench_scaling  # noqa: E402


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=8_000_000)
    ap.add_argument("--level", type=int, default=16)
    ap.add_argument("--mode", default="mor")
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--configs", default="split,buf,rawfs,gc|")
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()

    d = tempfile.mkdtemp(prefix="go_cdc_ab_", dir="/dev/shm")
    try:
        log_dir = os.path.join(d, "log")
        bench_scaling.generate(log_dir, args.events)
        bench_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_scaling.py")
        for cfg in args.configs.split("|"):
            for _ in range(args.repeats):
                env = dict(os.environ, SPARK_GRAFT_TUNE=cfg if cfg else "none")
                out = subprocess.run(
                    [sys.executable, bench_path,
                     "--worker-cpus", str(args.level), "--log-dir", log_dir,
                     "--n-buckets", str(args.n_buckets), "--mode", args.mode,
                     "--data-dir", d],
                    capture_output=True, text=True, timeout=3600, env=env,
                )
                line = next(
                    (ln for ln in out.stdout.splitlines()
                     if ln.startswith("WORKER_RESULT ")), None)
                if line is None:
                    print(f"CONFIG[{cfg}] FAILED", out.stdout[-500:], out.stderr[-1000:])
                    continue
                r = json.loads(line[len("WORKER_RESULT "):])
                r["tune"] = cfg or "none"
                r["load_before"] = round(os.getloadavg()[0], 1)
                print("AB " + json.dumps(r), flush=True)
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
