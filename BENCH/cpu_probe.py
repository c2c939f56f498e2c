#!/usr/bin/env python
"""Fixed-work-per-core host probe (no Spark): N identical pure-CPU tasks
on an N-process pool at N = 2, 8, 32. On a dedicated machine every task
takes the same time regardless of N; on this shared Firecracker host the
per-task time GROWS with busy-core count, which bounds the 8->32 scaling
efficiency any job can reach. Run interleaved with the scaling
measurement so both see the same host conditions; numbers quoted in
BENCH/BASELINE.md."""

import json
import multiprocessing as mp
import time


def work(_):
    t0 = time.monotonic()
    x = 0
    for i in range(40_000_000):
        x = (x * 1103515245 + 12345 + i) & 0x7FFFFFFF
    return time.monotonic() - t0


if __name__ == "__main__":
    out = {}
    for n in (2, 8, 32):
        with mp.Pool(n) as p:
            times = p.map(work, range(n))
        out[n] = {
            "mean_task_sec": round(sum(times) / len(times), 3),
            "max_task_sec": round(max(times), 3),
        }
    print(json.dumps(out))
