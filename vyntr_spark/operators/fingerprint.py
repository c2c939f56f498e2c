"""C13 request fingerprint (reference genesis/src/fingerprint.rs:9-88):
per-IP seeded pick of a user agent (desktop/mobile pools with market-share
weights) and a referrer (scheme://host unless the path is '/' or a 10%
drop). The reference seeds Rust's StdRng from hash(ip); this rebuild
derives the same *semantics* (stable per-IP picks, same weighted
distribution) from md5 so the choice is reproducible across engines —
documented deterministic analog, exact RNG streams are an implementation
detail of the Rust stdlib.

All native exprs (md5/conv/CASE chain) — no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# UA pools — data constants mirrored from fingerprint.rs:9-52 (must match
# for parity; they are data, not code)
DESKTOP_USER_AGENTS: list[tuple[str, float]] = [
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/132.0.0.0 Safari/537.3", 40.98),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/18.1.1 Safari/605.1.1", 12.7),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 Safari/605.1.1", 12.43),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/132.0.0.0 Safari/537.36 Edg/132.0.0.", 8.74),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/128.0.0.0 Safari/537.36 Edg/128.0.0.", 6.01),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:134.0) Gecko/20100101 Firefox/134.", 6.01),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/131.0.0.0 Safari/537.36 Edg/131.0.0.", 2.73),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:128.0) Gecko/20100101 Firefox/128.", 2.19),
    ("Mozilla/5.0 (Windows NT 6.1; Win64; x64; rv:109.0) Gecko/20100101 Firefox/115.", 2.19),
    ("Mozilla/5.0 (Windows NT 6.1; rv:109.0) Gecko/20100101 Firefox/115.", 1.09),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/131.0.0.0 Safari/537.36 OPR/116.0.0.", 1.09),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/125.0.0.0 Safari/537.36 Edg/125.0.0.", 1.09),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/109.0.0.0 Safari/537.3", 1.09),
    ("Mozilla/5.0 (Windows NT 6.1) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/109.0.0.0 Safari/537.36 OPR/95.0.0.", 0.55),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:131.0) Gecko/20100101 Firefox/131.", 0.55),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/131.0.0.0 Safari/537.3", 0.55),
]

MOBILE_USER_AGENTS: list[tuple[str, float]] = [
    ("Mozilla/5.0 (Linux; Android 10; K) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/132.0.0.0 Mobile Safari/537.3", 44.9),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 18_1_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/18.1.1 Mobile/15E148 Safari/604.", 15.31),
    ("Mozilla/5.0 (Linux; Android 10; K) AppleWebKit/537.36 (KHTML, like Gecko) SamsungBrowser/27.0 Chrome/125.0.0.0 Mobile Safari/537.3", 10.2),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 18_1_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) GSA/353.1.720279278 Mobile/15E148 Safari/604.", 4.08),
    ("Mozilla/5.0 (Linux; Android 10; moto e(6i) Build/QOH30.280-26) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/132.0.6834.163 Mobile Safari/537.3", 4.08),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_6_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/132.0.6834.100 Mobile/15E148 Safari/604.", 3.06),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 18_2_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/132.0.6834.100 Mobile/15E148 Safari/604.", 2.04),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 18_2_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/18.2 Mobile/15E148 Safari/604.", 2.04),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 18_3_0 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/132.0.6834.100 Mobile/15E148 Safari/604.", 2.04),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 18_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/18.1 Mobile/15E148 Safari/604.", 2.04),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_6_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.6 Mobile/15E148 Safari/604.", 2.04),
    ("Mozilla/5.0 (Linux; Android 10; K) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/111.0.0.0 Mobile Safari/537.3", 2.04),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 16_7_7 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.6 Mobile/15E148 Safari/604.", 1.02),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_5_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.5 Mobile/15E148 Safari/604.", 1.02),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 18_1_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/132.0.6834.100 Mobile/15E148 Safari/604.", 1.02),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 18_2_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/133.0.6943.33 Mobile/15E148 Safari/604.", 1.02),
    ("Mozilla/5.0 (Linux; Android 7.0; SM-G930V Build/NRD90M) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/59.0.3071.125 Mobile Safari/537.36 (compatible; Google-Read-Aloud; +https://support.google.com/webmasters/answer/1061943", 1.02),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 18_3_0 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/133.0.6943.33 Mobile/15E148 Safari/604.", 1.02),
]

MOBILE_SHARE = 42.6 / 100.0  # DESKTOP_MOBILE_RATIO, fingerprint.rs:54
REFERRER_DROP = 0.1          # fingerprint.rs:85


def uniform_expr(col, salt: str):
    """md5-derived uniform [0, 1): first 8 hex digits / 2^32. Stable
    across engines (the oracle replays the identical math)."""
    h = F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 8)
    return F.conv(h, 16, 10).cast("double") / F.lit(float(2 ** 32))


def _weighted_pick(u, pool: list[tuple[str, float]]):
    """Cumulative-threshold CASE chain: u in [0,1) -> weighted choice
    (choose_weighted analog)."""
    total = sum(w for _, w in pool)
    acc = 0.0
    expr = None
    for ua, w in pool[:-1]:
        acc += w
        cond = u < F.lit(acc / total)
        expr = F.when(cond, ua) if expr is None else expr.when(cond, ua)
    return expr.otherwise(F.lit(pool[-1][0]))


def request_fingerprint(df: DataFrame, ip_col: str = "ip",
                        url_col: str = "url") -> DataFrame:
    """Adds ``user_agent`` and ``referrer`` columns. Per-IP stable:
    pool pick (mobile share 42.6%) and UA pick derive from md5(ip);
    referrer = scheme://host unless path == '/' or the per-(ip,url) 10%
    drop fires (fingerprint.rs:57-88 semantics)."""
    ip = F.col(ip_col)
    u_pool = uniform_expr(ip, ":pool")
    u_ua = uniform_expr(ip, ":ua")
    ua = F.when(
        u_pool < F.lit(MOBILE_SHARE), _weighted_pick(u_ua, MOBILE_USER_AGENTS)
    ).otherwise(_weighted_pick(u_ua, DESKTOP_USER_AGENTS))

    url = F.col(url_col)
    scheme = F.split(url, "://", 2)[0]
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    after = F.element_at(F.split(url, "://", 2), 2)
    no_q = F.split(after, "\\?", 2)[0]
    path = F.when(
        F.instr(no_q, "/") > 0,
        F.concat(F.lit("/"), F.element_at(F.split(no_q, "/", 2), 2)),
    ).otherwise(F.lit("/"))
    u_ref = uniform_expr(F.concat_ws("|", ip, url), ":ref")
    referrer = F.when(
        (path != "/") & (u_ref >= F.lit(REFERRER_DROP)),
        F.concat(scheme, F.lit("://"), F.coalesce(host, F.lit(""))),
    )
    return df.withColumn("user_agent", ua).withColumn("referrer", referrer)


def oracle_sql_fragment(ip_sql: str, url_sql: str) -> str:
    """DuckDB expressions replaying the identical md5 math — generated
    from the SAME pool constants so Spark and oracle cannot drift."""

    def u(salt_src: str) -> str:
        # first 8 md5 hex digits -> integer via per-digit strpos math
        h = f"md5({salt_src})"
        terms = " + ".join(
            f"(strpos('0123456789abcdef', substr({h}, {k + 1}, 1)) - 1) "
            f"* {16 ** (7 - k)}"
            for k in range(8)
        )
        return f"(({terms}) / 4294967296.0)"

    def pick(u_sql: str, pool: list[tuple[str, float]]) -> str:
        total = sum(w for _, w in pool)
        acc = 0.0
        cases = []
        for ua, w in pool[:-1]:
            acc += w
            esc = ua.replace("'", "''")
            cases.append(f"WHEN {u_sql} < {acc / total!r} THEN '{esc}'")
        last = pool[-1][0].replace("'", "''")
        return "CASE " + " ".join(cases) + f" ELSE '{last}' END"

    u_pool = u(f"CAST({ip_sql} AS VARCHAR) || ':pool'")
    u_ua = u(f"CAST({ip_sql} AS VARCHAR) || ':ua'")
    u_ref = u(f"concat_ws('|', {ip_sql}, {url_sql}) || ':ref'")
    ua = (
        f"CASE WHEN {u_pool} < {MOBILE_SHARE!r} "
        f"THEN {pick(u_ua, MOBILE_USER_AGENTS)} "
        f"ELSE {pick(u_ua, DESKTOP_USER_AGENTS)} END"
    )
    # path computed exactly like the Spark expr: strip query, '/' +
    # everything after the authority's first '/', else '/'
    after = f"string_split({url_sql}, '://')[2]"
    no_q = f"string_split({after}, '?')[1]"
    path = (
        f"CASE WHEN strpos({no_q}, '/') > 0 "
        f"THEN '/' || substr({no_q}, strpos({no_q}, '/') + 1) "
        "ELSE '/' END"
    )
    scheme = f"string_split({url_sql}, '://')[1]"
    host = f"lower(string_split({no_q}, '/')[1])"
    referrer = (
        f"CASE WHEN {path} <> '/' AND {u_ref} >= {REFERRER_DROP!r} "
        f"THEN {scheme} || '://' || {host} END"
    )
    return ua, referrer


# ---------------------------------------------------------------------------
# C14 proxy pool (genesis/src/proxy.rs)
# ---------------------------------------------------------------------------

def load_proxy_pool(spark, lines: list[str]) -> DataFrame:
    """ProxyManager::new analog (proxy.rs:33-81): parse ``ip:port:user:
    pass`` lines into a proxy table. Lines without exactly 4 fields are
    dropped (the reference's filter_map); an unparseable IP falls back to
    0.0.0.0 (proxy.rs:45-48). addr = ``http://ip:port`` (proxy.rs:50).
    proxy_idx is the line's position among the VALID lines, matching the
    Vec index the reference rotates over."""
    rows = []
    idx = 0
    for line in lines:
        parts = line.split(":")
        if len(parts) != 4:
            continue
        ip = parts[0]
        octets = ip.split(".")
        if not (len(octets) == 4
                and all(o.isdigit() and int(o) <= 255 for o in octets)):
            ip = "0.0.0.0"
        rows.append((idx, ip, parts[1], parts[2],
                     f"http://{parts[0]}:{parts[1]}"))
        idx += 1
    return spark.createDataFrame(
        rows, "proxy_idx int, ip string, port string, username string, addr string"
    )


def proxy_pick_expr(n_proxies: int, seed: int, rnd: int,
                    url_col: str = "url"):
    """Deterministic pool index for a request. The reference rotates an
    atomic cursor (``current.fetch_add(1) % len``, proxy.rs:88) — exact
    round-robin, but order-dependent and so nondeterministic under
    concurrency. The rebuild's analog picks uniformly by the seeded
    request key md5(seed:round:url): same balanced-rotation intent,
    reproducible across runs AND executor counts, and window-free (a
    distributed row_number would serialize the batch through one task).
    The request key is the C7 seeded shuffle key — one derivation shared
    with politeness.batch_shuffle_key so the two can't drift."""
    from .politeness import batch_shuffle_key

    key = batch_shuffle_key(seed, rnd, url_col)
    return F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("long"),
        F.lit(n_proxies),
    ).cast("int")


def assign_proxies(batch: DataFrame, proxies: DataFrame, seed: int,
                   rnd: int, url_col: str = "url") -> DataFrame:
    """C14: batch rows + (proxy_idx, addr, ip) of the picked proxy.
    The pool is tiny (a proxies.txt) — broadcast join, no shuffle."""
    n = proxies.count()
    if n == 0:
        return batch.withColumn("proxy_idx", F.lit(None).cast("int")) \
                    .withColumn("addr", F.lit(None).cast("string")) \
                    .withColumn("proxy_ip", F.lit(None).cast("string"))
    b = batch.withColumn("proxy_idx", proxy_pick_expr(n, seed, rnd, url_col))
    p = proxies.select(
        "proxy_idx", "addr", F.col("ip").alias("proxy_ip")
    )
    return b.join(F.broadcast(p), "proxy_idx", "left")
