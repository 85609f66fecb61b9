"""Pure-CPU scaling control for the virtualized bench host.

The engine's N->4N scaling efficiency is measured on a single
virtualized VM (see BASELINE.md "Hardware"), whose CPU-steal and
shared memory bandwidth put a HARDWARE ceiling on any code's scaling
well below 1.0.  This control measures that ceiling with work that has
zero framework overhead — P independent processes each spinning a
fixed-iteration integer xorshift loop (register-only ALU work, no
memory traffic, no IPC) — so an engine efficiency number can be read
against what the box itself allows on the same day, same load.

    python tools/cpu_control.py [--cpus 2,8] [--iters 200000000]
                                [--trials 3]

Throughput at P = P * iters / median(per-process wall); efficiency
P1->P2 = thr(P2) / ((P2/P1) * thr(P1)).  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import statistics
import time


def _spin(iters: int, out) -> None:
    x = 88172645463325252
    t0 = time.perf_counter()
    for _ in range(iters):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    out.put(time.perf_counter() - t0)


def run_level(procs: int, iters: int, trials: int) -> dict:
    best = None
    for _ in range(max(trials, 1)):
        q = mp.Queue()
        ps = [
            mp.Process(target=_spin, args=(iters, q)) for _ in range(procs)
        ]
        t0 = time.perf_counter()
        for p in ps:
            p.start()
        secs = [q.get() for _ in ps]
        for p in ps:
            p.join()
        wall = time.perf_counter() - t0
        thr = procs * iters / max(secs)
        trial = {
            "procs": procs,
            "wall": round(wall, 3),
            "per_proc_max": round(max(secs), 3),
            "per_proc_median": round(statistics.median(secs), 3),
            "ops_per_sec": round(thr, 0),
        }
        if best is None or trial["ops_per_sec"] > best["ops_per_sec"]:
            best = trial
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default="2,8")
    ap.add_argument("--iters", type=int, default=200_000_000)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    levels = [
        run_level(int(c), args.iters, args.trials)
        for c in args.cpus.split(",")
    ]
    out = {"metric": "pure-ALU process-scaling control", "levels": levels}
    if len(levels) >= 2:
        lo, hi = levels[0], levels[-1]
        factor = hi["procs"] / lo["procs"]
        out["parallelism_factor"] = factor
        out["scaling_efficiency"] = round(
            hi["ops_per_sec"] / (factor * lo["ops_per_sec"]), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
