#!/usr/bin/env python
"""One scaling-evidence run at a fixed parallelism (spawned by
run_scaling.py). Runs the north-rule crawl workload on the cached
synthetic web and prints one JSON line:
{wall_sec, fetched, frontier_processed, analyses_hash, cpus}.

The analyses_hash is an order-insensitive content hash — identical
hashes across parallelism levels evidence the determinism contract
(SURVEY.md §5.5) alongside the throughput scaling numbers.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vyntr_spark.crawl import CrawlEngine  # noqa: E402
from vyntr_spark.session import get_spark  # noqa: E402
from vyntr_spark.synth import cached_pages_path, default_seeds  # noqa: E402
from vyntr_spark.tables import PAGES, SnapshotStore  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2])
    n_hosts = int(sys.argv[3])
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_data"
    )
    pages_path = cached_pages_path(cache, n_pages, n_hosts, seed=42)

    spark = get_spark(f"scaling-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.schema(PAGES).parquet(pages_path)

    whdir = tempfile.mkdtemp(prefix=f"scal_wh_{cpus}_")
    store = SnapshotStore(spark, whdir)
    eng = CrawlEngine(spark, store, pages, max_pages=n_pages, seed=42,
                      salt_buckets=max(8, cpus))
    eng.init_from_seeds(default_seeds(n_pages, n_hosts, k=max(5, n_hosts // 4)))

    # warm up python workers + codegen outside the timed region
    pages.limit(32).select(F.md5("url")).count()

    t0 = time.monotonic()
    infos = eng.run(max_rounds=rounds)
    wall = time.monotonic() - t0

    fetched = sum(i.selected for i in infos)
    frontier_processed = fetched + sum(i.new_urls for i in infos)

    an = store.table("analyses").read().select(
        F.md5(F.concat_ws("\x00", "url", "content_text", "title")).alias("h")
    )
    hashes = sorted(r["h"] for r in an.collect())
    digest = hashlib.md5("".join(hashes).encode()).hexdigest()

    import shutil

    shutil.rmtree(whdir, ignore_errors=True)
    print(json.dumps({
        "cpus": cpus,
        "wall_sec": round(wall, 3),
        "rounds": len(infos),
        "fetched": fetched,
        "frontier_processed": frontier_processed,
        "pages_per_sec": round(fetched / wall, 2),
        "frontier_urls_per_sec": round(frontier_processed / wall, 2),
        "analyses_hash": digest,
        "n_analyses": len(hashes),
    }))


if __name__ == "__main__":
    main()
