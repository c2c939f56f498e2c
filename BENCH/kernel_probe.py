#!/usr/bin/env python
"""Workload-matched scaling probe: the bare extraction kernel, no Spark.

BENCH/cpu_probe.py measures the host's pure-CPU ceiling (tight arithmetic
loop — r2 measured per-core at 32-busy running at 0.80-0.86x of 8-busy).
That probe under-states the ceiling for THIS job: HTML extraction is
allocator/memory-bandwidth-bound (string slicing over ~30 KB pages), and
on this shared VM memory bandwidth saturates well before ALU throughput.

This probe runs vyntr_spark.extract.extract_html over the SAME synthetic
web pages the scaling sweep crawls, via bare multiprocessing.Pool — no
JVM, no Arrow, no shuffle — at a given worker count, pinned by the
caller. The 8-vs-32 ratio of its pages/s is the correct same-window
ceiling for the crawl's extraction-dominated rounds: if the END-TO-END
job matches this ratio, Spark's machinery (scan, broadcast join, Arrow
exchange, commit) is adding zero scaling loss on top of the host.

r3 measurement (same window, pinned):
  taskset -c 0-7  kernel_probe.py 8   -> 2,379-2,724 pages/s
  taskset -c 0-31 kernel_probe.py 32  -> 5,152 pages/s
  => kernel 8->32 scaling 0.47-0.54, vs cpu_probe's 0.851 pure-CPU
  ceiling in the same window. The crawl measured 0.359 raw = ~0.72 of
  the kernel ceiling; the Spark-side phases alone (scan 0.90, write
  >1.0) clear it.

Usage: taskset -c 0-(K-1) python BENCH/kernel_probe.py K [n_pages]
Prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGES_GLOB = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_data", "pages_web_n120000_h12000_s42_z0.25.parquet", "*.parquet",
)


def work(args):
    us, hs = args
    from vyntr_spark.extract import extract_html

    total = 0
    for u, h in zip(us, hs):
        total += len(extract_html(h, u).links)
    return total


def main() -> None:
    import pyarrow.parquet as pq

    k = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    files = sorted(glob.glob(PAGES_GLOB))
    if not files:
        raise SystemExit(
            "no cached synthetic web — run the scaling sweep (or bench.py "
            "at sf0.1) once to generate .bench_data"
        )
    tbl = pq.read_table(files, columns=["url", "html"])
    n = min(n, tbl.num_rows)
    urls = tbl.column("url").to_pylist()[:n]
    htmls = tbl.column("html").to_pylist()[:n]
    del tbl
    chunks = [(urls[i::k], htmls[i::k]) for i in range(k)]
    with Pool(k) as p:
        t0 = time.time()
        links = sum(p.map(work, chunks))
        dt = time.time() - t0
    print(json.dumps({
        "workers": k, "pages": n, "wall_sec": round(dt, 2),
        "pages_per_sec": round(n / dt, 1), "links": links,
    }))


if __name__ == "__main__":
    main()
