"""Measure THIS BOX's parallel-scaling ceilings, Spark-free.

The north rule asks for >=0.8 throughput scaling efficiency between N and
4N executor clusters.  In this sandbox both "clusters" are core subsets of
one shared VM, so any engine measurement is bounded by what the box itself
gives perfectly parallel work.  This script measures that bound with two
multiprocessing kernels (no Spark, no shuffle, no IPC beyond pool setup):

  alu    — 4 KB L1-resident uint64 mix loop: pure ALU, no DRAM traffic.
           Any efficiency loss here is clock/hypervisor/noisy-neighbor,
           not software.
  stream — 16 MB/proc uint64 streaming multiply: DRAM-bandwidth bound.
           Models the memory-heavy half of a shuffle-join superstep.

Each kernel runs `samples` times at each occupancy level with FIXED
per-process work, interleaving levels to control for time-varying host
noise.  Ideal scaling = flat wall time; ceiling efficiency for an N->4N
pair = wall(N) / wall(4N).

Usage: python scripts/box_ceiling.py [samples] [levels...]
       (defaults: 3 samples, levels 4 16)
"""

import json
import multiprocessing as mp
import statistics
import sys
import time
import warnings

import numpy as np

warnings.filterwarnings("ignore")


def _alu(iters):
    x = np.arange(512, dtype=np.uint64)  # 4 KB: L1-resident
    for _ in range(int(iters)):
        x = x * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1)
        x ^= x >> np.uint64(31)
    return int(x[0] & np.uint64(0xFF))


def _stream(iters):
    x = np.arange(2_000_000, dtype=np.uint64)  # 16 MB: DRAM-streaming
    for _ in range(int(iters)):
        x = x * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1)
        x ^= x >> np.uint64(31)
    return int(x[0] & np.uint64(0xFF))


KERNELS = {"alu": (_alu, 300_000), "stream": (_stream, 300)}


def run_level(kernel, n_procs, iters):
    t0 = time.time()
    with mp.Pool(n_procs) as p:
        p.map(kernel, [iters] * n_procs)
    return time.time() - t0


def main():
    samples = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    levels = [int(x) for x in sys.argv[2:]] or [4, 16]
    walls = {(k, n): [] for k in KERNELS for n in levels}
    for s in range(samples):
        for name, (fn, iters) in KERNELS.items():
            for n in levels:  # interleave levels within each sample round
                w = run_level(fn, n, iters)
                walls[(name, n)].append(w)
                print(
                    json.dumps(
                        {"kernel": name, "procs": n, "sample": s, "wall_s": round(w, 2)}
                    ),
                    flush=True,
                )
    print("\n# fixed per-proc work: ideal = flat wall; eff(N->M) = wall(N)/wall(M)")
    for name in KERNELS:
        meds = {n: statistics.median(walls[(name, n)]) for n in levels}
        lo = levels[0]
        for n in levels[1:]:
            print(
                f"{name}: procs {lo}->{n}  wall {meds[lo]:.2f}s -> {meds[n]:.2f}s  "
                f"ceiling_efficiency={meds[lo] / meds[n]:.3f}"
            )


if __name__ == "__main__":
    main()
