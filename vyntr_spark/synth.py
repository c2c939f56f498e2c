"""Deterministic synthetic Common-Crawl-style web generator.

Produces the ``pages(url, warc_ts, html, text, lang, content_type,
status, body_marker)`` table of FIXTURES.md §1: hosts with Zipf page
counts (hot-domain skew on purpose), a seeded cross-link graph, HTML
assembled from templates that exercise every extractor branch, and the
golden ``text`` column computed by the shared extraction spec
(vyntr_spark.extract) — the engine must reproduce it byte-identically.

Everything is seeded (default 42); no external data, no network. Page i
is generated from ``Random(f"{seed}:{i}")`` so generation parallelizes
and is order-independent.
"""

from __future__ import annotations

import hashlib
import os
import random
from concurrent.futures import ProcessPoolExecutor
from datetime import datetime, timezone

from .extract import extract_html

WORDS = (
    "data spark table scan merge join filter window agg sort hash key "
    "row column batch stream query part order value group vector fast "
    "slow big small line customer dup crawl index search rank score"
).split()

LANGS = ["en", "en", "en", "de", "ja", "", None]  # None = no lang attr

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp()


def _stable_int(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def plan_hosts(n_pages: int, n_hosts: int, zipf_s: float = 1.2) -> list[int]:
    """Zipf page counts per host (index 0 is the hot host)."""
    n_hosts = min(n_hosts, n_pages)  # every host carries ≥1 page
    w = [1.0 / (i + 1) ** zipf_s for i in range(n_hosts)]
    tot = sum(w)
    counts = [max(1, int(round(n_pages * x / tot))) for x in w]
    # trim/pad to exactly n_pages (track the running total — recomputing
    # sum() per step is O(excess * n_hosts) and hangs at 10^5 hosts)
    total = sum(counts)
    i = 0
    while total > n_pages:
        j = len(counts) - 1 - (i % len(counts))
        if counts[j] > 1:
            counts[j] -= 1
            total -= 1
        i += 1
    i = 0
    while total < n_pages:
        counts[i % len(counts)] += 1
        total += 1
        i += 1
    return counts


def page_urls(n_pages: int, n_hosts: int) -> list[tuple[str, str]]:
    """[(host, url)] for page index 0..n_pages-1, deterministic."""
    counts = plan_hosts(n_pages, n_hosts)
    out: list[tuple[str, str]] = []
    for h, c in enumerate(counts):
        host = f"host{h}.example"
        for p in range(c):
            out.append((host, f"http://{host}/p{p}.html"))
    return out


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _page_html(idx: int, host: str, url: str, all_urls: list[str], seed: int) -> tuple[str, str, int, str | None, str]:
    """Return (html, lang_col, status, body_marker, content_type)."""
    rng = random.Random(f"{seed}:{idx}")
    lang = rng.choice(LANGS)
    lang_attr = "" if lang is None else f' lang="{lang}"'
    lang_col = lang or ""

    title = _sentence(rng, 3)
    if rng.random() < 0.15:
        title += " &amp; more"

    parts = ["<!DOCTYPE html>", f"<html{lang_attr}><head>", f"<title>{title}</title>"]
    parts.append(f'<meta name="description" content="{_sentence(rng, 6)}">')
    if rng.random() < 0.5:
        parts.append('<meta property="og:type" content="article">')
    if rng.random() < 0.2:
        parts.append(f'<meta name="keywords" content="{_sentence(rng, 4)}">')
    if rng.random() < 0.3:
        parts.append(f'<link rel="canonical" href="{url}">')
    parts.append("</head><body>")
    parts.append(f"<h1>{_sentence(rng, 2).title()}</h1>")

    # link targets: mostly same-host neighbors + some cross-host
    n_links = rng.randint(2, 9)
    targets = [all_urls[rng.randrange(len(all_urls))] for _ in range(n_links)]
    link_iter = iter(targets)

    n_paras = rng.randint(2, 6)
    for _ in range(n_paras):
        words = _sentence(rng, rng.randint(8, 25))
        frag = f"<p>{words}"
        if rng.random() < 0.4:
            frag += f" <b>{rng.choice(WORDS)}</b> {rng.choice(WORDS)}"
        if rng.random() < 0.15:
            frag += " &amp; entities &#65; here"
        t = next(link_iter, None)
        if t is not None:
            # relative href for same-host targets half the time
            if t.startswith(f"http://{host}/") and rng.random() < 0.5:
                href = t.rsplit("/", 1)[1]
            else:
                href = t
            frag += f' see <a href="{href}">{rng.choice(WORDS)}</a>'
        frag += "</p>"
        parts.append(frag)

    if rng.random() < 0.5:
        items = "".join(f"<li>{_sentence(rng, rng.randint(1, 4))}</li>" for _ in range(rng.randint(2, 5)))
        parts.append(f"<ul>{items}</ul>")
    if rng.random() < 0.1:
        parts.append("<p>   </p>")  # whitespace-torture separator case

    # remaining links after paragraphs + junk links
    for t in link_iter:
        parts.append(f'<a href="{t}">{rng.choice(WORDS)}</a>')
    if rng.random() < 0.2:
        parts.append('<a href="/static/app.js">asset</a><a href="doc.pdf">pdf</a>')
    if rng.random() < 0.2:
        parts.append(f'<a href="{url}#section">self</a><a href="mailto:a@b.c">mail</a>')
    if rng.random() < 0.1:
        parts.append('<a href="/feed">feed</a>')

    parts.append("</body></html>")
    html = "\n".join(parts)

    # fetch-gate auxiliary columns (FIXTURES.md §1)
    r = rng.random()
    if r < 0.02:
        status, marker, ctype = 403, None, "text/html"
    elif r < 0.03:
        status, marker, ctype = 200, "403 Forbidden", "text/html"
    elif r < 0.04:
        status, marker, ctype = 200, "Cloudflare ... Worker threw exception", "text/html"
    elif r < 0.06:
        status, marker, ctype = 200, None, rng.choice(["application/pdf", "image/png"])
    else:
        status, marker, ctype = 200, None, "text/html"
    return html, lang_col, status, marker, ctype


def _gen_chunk(args: tuple[int, int, list[tuple[str, str]], list[str], int]) -> list[dict]:
    lo, hi, hostsurls, all_urls, seed = args
    rows = []
    for i in range(lo, hi):
        host, url = hostsurls[i]
        html, lang, status, marker, ctype = _page_html(i, host, url, all_urls, seed)
        golden = extract_html(html, url)
        rows.append(
            {
                "url": url,
                "warc_ts": datetime.fromtimestamp(
                    _EPOCH + (_stable_int(url) % 31_536_000), tz=timezone.utc
                ),
                "html": html.encode("utf-8"),
                "text": golden.content_text,
                "lang": lang,
                "content_type": ctype,
                "status": status,
                "body_marker": marker,
            }
        )
    return rows


def generate_pages(n_pages: int, n_hosts: int, seed: int = 42,
                   parallelism: int | None = None) -> list[dict]:
    """Generate the pages table as a list of row dicts (deterministic)."""
    hostsurls = page_urls(n_pages, n_hosts)
    all_urls = [u for _, u in hostsurls]
    if parallelism is None:
        parallelism = min(os.cpu_count() or 4, 16) if n_pages > 2000 else 1
    if parallelism <= 1:
        return _gen_chunk((0, n_pages, hostsurls, all_urls, seed))
    step = (n_pages + parallelism - 1) // parallelism
    chunks = [(lo, min(lo + step, n_pages), hostsurls, all_urls, seed)
              for lo in range(0, n_pages, step)]
    rows: list[dict] = []
    with ProcessPoolExecutor(max_workers=parallelism) as ex:
        for part in ex.map(_gen_chunk, chunks):
            rows.extend(part)
    return rows


def write_pages_parquet(path: str, n_pages: int, n_hosts: int, seed: int = 42) -> str:
    """Generate and write pages as a parquet file; returns path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = generate_pages(n_pages, n_hosts, seed)
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    table = pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us", tz="UTC")),
            "html": pa.array(cols["html"], pa.binary()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
            "content_type": pa.array(cols["content_type"], pa.string()),
            "status": pa.array(cols["status"], pa.int32()),
            "body_marker": pa.array(cols["body_marker"], pa.string()),
        }
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(table, path)
    return path


# ---------------------------------------------------------------------------
# "web" profile: realistically-sized pages (~25-50 KB) + distributed
# generation. Common-Crawl HTML averages tens of KB; the tiny profile above
# (~1 KB) is right for unit tests but makes any crawl benchmark
# scheduler-bound. The web profile is generated THROUGH Spark (mapInPandas
# over a page-index range) — the same shape the generator needs at 100 TB:
# no driver-side materialization, deterministic per index, link targets
# computed arithmetically from the Zipf host layout instead of a broadcast
# url list.
# ---------------------------------------------------------------------------

WEB_WORDS = WORDS + (
    "engine cluster shard replica commit snapshot frontier parse token "
    "page link host domain fetch robots sitemap anchor cache header body "
    "title section article footer nav media image video codec"
).split()


def host_prefix(counts: list[int]) -> list[int]:
    pre = [0]
    for c in counts:
        pre.append(pre[-1] + c)
    return pre


def url_at(pre: list[int], idx: int) -> tuple[str, str]:
    """(host, url) of page index ``idx`` under the Zipf layout — O(log H),
    no materialized url list (10^10-frontier friendly)."""
    import bisect

    h = bisect.bisect_right(pre, idx) - 1
    return f"host{h}.example", f"http://host{h}.example/p{idx - pre[h]}.html"


def _page_html_web(idx: int, n_pages: int, pre: list[int], seed: int
                   ) -> tuple[str, str, str, str, int, str | None, str]:
    """Return (host, url, html, lang_col, status, body_marker, content_type)."""
    rng = random.Random(f"{seed}:web:{idx}")
    host, url = url_at(pre, idx)
    import bisect

    h = bisect.bisect_right(pre, idx) - 1
    lo, hi = pre[h], pre[h + 1]

    def target(local_bias: float = 0.7) -> str:
        if rng.random() < local_bias and hi - lo > 1:
            return url_at(pre, rng.randrange(lo, hi))[1]
        return url_at(pre, rng.randrange(n_pages))[1]

    lang = rng.choice(LANGS)
    lang_attr = "" if lang is None else f' lang="{lang}"'
    title = _sentence(rng, rng.randint(3, 7))
    parts = ["<!DOCTYPE html>", f"<html{lang_attr}><head>",
             f"<title>{title}</title>",
             f'<meta name="description" content="{_sentence(rng, 12)}">']
    for _ in range(rng.randint(3, 9)):
        parts.append(
            f'<meta name="m{rng.randrange(24)}" content="{_sentence(rng, 8)}">'
        )
    if rng.random() < 0.4:
        parts.append('<meta property="og:type" content="article">')
    if rng.random() < 0.3:
        parts.append(f'<link rel="canonical" href="{url}">')
    parts.append("</head><body><nav><ul>")
    for _ in range(rng.randint(8, 18)):
        t = target()
        href = t.rsplit("/", 1)[1] if t.startswith(f"http://{host}/") else t
        parts.append(f'<li><a href="{href}">{rng.choice(WEB_WORDS)}</a></li>')
    parts.append("</ul></nav>")
    parts.append(f"<h1>{_sentence(rng, 3).title()}</h1>")
    for p in range(rng.randint(40, 90)):
        if p % 7 == 0:
            parts.append(f"<h2>{_sentence(rng, 3)}</h2>")
        words = _sentence(rng, rng.randint(20, 45))
        frag = f"<p>{words}"
        if rng.random() < 0.3:
            frag += f" <b>{rng.choice(WEB_WORDS)}</b> {rng.choice(WEB_WORDS)}"
        if rng.random() < 0.1:
            frag += " &amp; entities &#65; here"
        if rng.random() < 0.4:
            frag += f' see <a href="{target()}">{rng.choice(WEB_WORDS)}</a>'
        frag += "</p>"
        parts.append(frag)
        if rng.random() < 0.1:
            items = "".join(
                f"<li>{_sentence(rng, rng.randint(2, 6))}</li>"
                for _ in range(rng.randint(2, 6))
            )
            parts.append(f"<ul>{items}</ul>")
    if rng.random() < 0.1:
        parts.append("<p>   </p>")
    if rng.random() < 0.25:
        parts.append('<a href="/static/app.js">asset</a><a href="doc.pdf">pdf</a>')
    if rng.random() < 0.2:
        parts.append(f'<a href="{url}#top">self</a><a href="mailto:a@b.c">mail</a>')
    if rng.random() < 0.1:
        parts.append('<a href="/feed">feed</a>')
    parts.append("</body></html>")
    html = "\n".join(parts)

    r = rng.random()
    if r < 0.02:
        status, marker, ctype = 403, None, "text/html"
    elif r < 0.03:
        status, marker, ctype = 200, "403 Forbidden", "text/html"
    elif r < 0.04:
        status, marker, ctype = 200, "Cloudflare ... Worker threw exception", "text/html"
    elif r < 0.06:
        status, marker, ctype = 200, None, rng.choice(["application/pdf", "image/png"])
    else:
        status, marker, ctype = 200, None, "text/html"
    return host, url, html, lang or "", status, marker, ctype


def write_pages_parquet_spark(spark, path: str, n_pages: int, n_hosts: int,
                              seed: int = 42, partitions: int | None = None,
                              zipf_s: float = 1.2) -> str:
    """Distributed deterministic generation of the web-profile pages table.

    mapInPandas over ``spark.range(n_pages)``: each task generates its page
    indices independently (Random(f"{seed}:web:{i}")), computes the golden
    ``text`` via the shared extraction spec, and writes parquet directly —
    content is partitioning-independent, so any parallelism yields the
    same table.
    """
    import pandas as pd

    from .tables import PAGES

    counts = plan_hosts(n_pages, n_hosts, zipf_s)
    pre = host_prefix(counts)

    def gen(batches):
        from .extract import extract_html

        for pdf in batches:
            rows = {k: [] for k in ("url", "warc_ts", "html", "text", "lang",
                                    "content_type", "status", "body_marker")}
            for idx in pdf["id"]:
                idx = int(idx)
                _host, url, html, lang, status, marker, ctype = _page_html_web(
                    idx, n_pages, pre, seed
                )
                rows["url"].append(url)
                rows["warc_ts"].append(pd.Timestamp(
                    _EPOCH + (_stable_int(url) % 31_536_000), unit="s", tz="UTC"
                ))
                rows["html"].append(html.encode("utf-8"))
                rows["text"].append(extract_html(html, url).content_text)
                rows["lang"].append(lang)
                rows["content_type"].append(ctype)
                rows["status"].append(status)
                rows["body_marker"].append(marker)
            yield pd.DataFrame(rows)

    n_part = partitions or spark.sparkContext.defaultParallelism * 2
    df = spark.range(0, n_pages, numPartitions=n_part).mapInPandas(gen, PAGES)
    df.write.mode("overwrite").parquet(path)
    return path


def cached_pages_path_spark(cache_dir: str, spark, n_pages: int, n_hosts: int,
                            seed: int = 42, zipf_s: float = 1.2) -> str:
    """Generate-once cache for the web profile (directory of parquet parts)."""
    ztag = "" if zipf_s == 1.2 else f"_z{zipf_s}"
    path = os.path.join(
        cache_dir, f"pages_web_n{n_pages}_h{n_hosts}_s{seed}{ztag}.parquet"
    )
    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        write_pages_parquet_spark(spark, path, n_pages, n_hosts, seed,
                                  zipf_s=zipf_s)
    return path


def default_seeds_web(n_pages: int, n_hosts: int, k: int,
                      per_host: int = 1, zipf_s: float = 1.2) -> list[str]:
    """First ``per_host`` pages of the k hottest hosts under the Zipf
    layout (no url list materialization). per_host=cap makes round 1 a
    full-width politeness round."""
    counts = plan_hosts(n_pages, n_hosts, zipf_s)
    pre = host_prefix(counts)
    seeds = []
    for h in range(min(k, len(counts))):
        for p in range(min(per_host, counts[h])):
            seeds.append(url_at(pre, pre[h] + p)[1])
    return seeds


def default_seeds(n_pages: int, n_hosts: int, k: int = 5) -> list[str]:
    """Seed list: first page of the k hottest hosts (mirrors data/sites.txt
    ingestion, genesis/src/main.rs:142-147)."""
    urls = page_urls(n_pages, n_hosts)
    seeds, seen_hosts = [], set()
    for host, url in urls:
        if host not in seen_hosts:
            seen_hosts.add(host)
            seeds.append(url)
        if len(seeds) >= k:
            break
    return seeds


def cached_pages_path(cache_dir: str, n_pages: int, n_hosts: int, seed: int = 42) -> str:
    """Generate-once cache used by bench/entry."""
    path = os.path.join(cache_dir, f"pages_n{n_pages}_h{n_hosts}_s{seed}.parquet")
    if not os.path.exists(path):
        write_pages_parquet(path, n_pages, n_hosts, seed)
    return path
