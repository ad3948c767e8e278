"""Opportunistic scaling sampler: run interleaved local[8]/local[32]
pipeline measurements whenever the box looks quiet, appending every sample
to BENCH/scaling_attempts.jsonl. The final efficiency quote takes min-wall
per level across ALL samples (each level needs one clean window; the
hypervisor steals 0-25% of CPU in bursts).

Usage: python tools/scaling_sampler.py [n_docs] [n_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


hw_canary = bench.hw_canary  # single implementation, shared with headline mode


def wait_quiet(limit: float = 2.0, max_wait_s: int = 300) -> float:
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        la = loadavg()
        if la < limit:
            return la
        time.sleep(10)
    return loadavg()


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    corpus = f"/tmp/deepex_scaling_corpus_{n_docs}"
    if not os.path.exists(corpus):
        bench._materialize_corpus(n_docs, 42, corpus)
    import subprocess

    rev = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip()
    os.makedirs("BENCH", exist_ok=True)
    log = "BENCH/scaling_attempts.jsonl"
    for _ in range(rounds):
        for threads in (8, 32):
            la = wait_quiet()
            hw = hw_canary()
            n, dt, steal = bench._run_pipeline_once(threads, corpus)
            rec = {
                "ts": round(time.time(), 1), "n_docs": n_docs, "threads": threads,
                "n_triples": n, "sec": round(dt, 2), "rate": round(n / dt, 1),
                "steal_pct": steal, "load_at_start": la, "hw_mops": hw,
                "git_rev": rev,
                "driver_mem": os.environ.get("SPARK_DRIVER_MEM", "8g"),
            }
            with open(log, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
