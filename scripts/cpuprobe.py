#!/usr/bin/env python3
"""Pure-CPU scaling anchor for bench sessions (see BENCH.md).

Runs an identical integer-hash chunk in 8 and then 32 parallel processes.
With no memory-bandwidth or scheduler contention, the 32-process wall
equals the 8-process wall (every worker does the same chunk), so
efficiency = t8/t32; the healthy band on this VM is ~0.77-0.83. Quote the
number next to any gate-leg wall times measured the same session.
"""
import multiprocessing as mp
import time


def burn(_):
    h = 1469598103934665603
    for i in range(6_000_000):
        h = ((h ^ i) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def wall(n):
    with mp.Pool(n) as p:
        t0 = time.monotonic()
        p.map(burn, range(n))
        return time.monotonic() - t0


if __name__ == "__main__":
    wall(4)  # warmup
    t8 = min(wall(8) for _ in range(2))
    t32 = min(wall(32) for _ in range(2))
    print(f"t8={t8:.2f}s t32={t32:.2f}s efficiency(8->32)={t8 / t32:.2f}")
