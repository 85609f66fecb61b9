"""Memory-bandwidth scaling control for the virtualized bench host.

The pure-ALU control (`cpu_control.py`) measures the host's
instruction-throughput ceiling — but a CDC engine's hot loop is
shuffle writes, parquet decode and hash probes: MEMORY-bound work.
SMT threads share a physical core's load/store ports and all cores
share the memory controllers, so the bandwidth ceiling from N to 4N
processes is far lower than the ALU one — and it, not the ALU number,
is the relevant hardware bound for engine scaling across the
physical-core / SMT boundary.

This control measures it directly: P independent processes each
stream-copy a buffer far larger than L3 (numpy copyto, ~2 bytes moved
per byte of buffer) for a fixed repeat count.

    python tools/membw_control.py [--cpus 8,32] [--mb 256] [--reps 20]
                                  [--trials 3]

Throughput at P = P * reps * 2 * mb / median(per-process wall);
efficiency P1->P2 = thr(P2) / ((P2/P1) * thr(P1)). One JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import statistics
import time


def _stream(mb: int, reps: int, out) -> None:
    import numpy as np

    src = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
    dst = np.empty_like(src)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.copyto(dst, src)
        src[0] += dst[0]  # defeat any copy elision
    out.put(time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=str, default="8,32")
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    levels = [int(c) for c in args.cpus.split(",")]
    results = []
    for procs in levels:
        walls = []
        for _ in range(args.trials):
            q = mp.Queue()
            ps = [
                mp.Process(target=_stream, args=(args.mb, args.reps, q))
                for _ in range(procs)
            ]
            for p in ps:
                p.start()
            times = [q.get() for _ in ps]
            for p in ps:
                p.join()
            walls.append(statistics.median(times))
        wall = min(walls)
        moved_gb = procs * args.reps * 2 * args.mb / 1024.0
        results.append(
            {
                "procs": procs,
                "per_proc_median_wall": round(wall, 3),
                "gb_per_sec": round(moved_gb / wall, 2),
            }
        )
    out = {"metric": "stream-copy memory-bandwidth control", "levels": results}
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        factor = hi["procs"] / lo["procs"]
        out["parallelism_factor"] = factor
        out["scaling_efficiency"] = round(
            hi["gb_per_sec"] / (factor * lo["gb_per_sec"]), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
