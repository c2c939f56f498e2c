"""W1 — search orchestration: the driver-side composition that merges web
results with instant answers into one response.

Rebuild of ``performSearch`` (website/src/lib/server/search.ts:14-100):
fan out to the sub-answerers — query-log upsert (W2), date math (W6),
unit conversion (W7), AI-summary cache (W5), web search with the
``NOT nsfw:true`` gate (3.2 lifecycle), wordnet fuzzy lookup (W4),
currency (W8), math eval (W9), bang redirect (W10) — and merge into one
dict. The sub-answerers are the tested operators in operators/serving.py
and operators/pulse.py; this module only composes them, mirroring the
reference's orchestration order and short-circuits (a bang redirect
returns immediately, search.ts behavior of bangs.ts).

Everything driver-side here is pure Python on a single query string; the
only Spark work is the web search (and optional cache/wordnet lookups),
exactly like the reference where instant answers are computed in the web
server and only the web search hits the index.
"""

from __future__ import annotations

import re
from datetime import date, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import pulse
from .operators.serving import (
    BANGS,
    CURRENCY_RATES_USD,
    HOLIDAY_RULES,
    UNIT_FACTORS,
    _BANG_RE,
    _CUR_RE,
    _UNIT_RE,
    easter_date,
    holiday_occurrence,
    math_eval,
    nth_weekday,
    trigram_score,
    trigram_similarity,
)

# W6: the FULL date.ts holiday table lives in operators/serving.py
# (HOLIDAY_RULES, date.ts:185-306 parity). Matching is substring over
# the query in table insertion order, like the reference's
# `query.includes(key)`; 'since'/'from' flips to the most recent past
# occurrence (date.ts:310-311 lookingBack).
_DAYS_UNTIL_RE = re.compile(
    r"(?:how\s+many\s+)?days\s+(?:until|since|from)\s+(.+?)\s*\??$"
)


def parse_date_query(q: str, today: date) -> dict | None:
    """W6: 'days until|since <holiday|YYYY-MM-DD>' →
    {target, name, date, days}."""
    m = _DAYS_UNTIL_RE.search(q)
    if not m:
        return None
    # whole-query substring check, NOT the matched keyword: date.ts:310
    # does `query.includes('since') || query.includes('from')`, so a
    # query like "days until christmas from now" looks back there too —
    # quirk kept for parity.
    looking_back = ("since" in q) or ("from" in q)
    target = m.group(1).strip().lower()
    # insertion-order first-substring-match like date.ts:334
    # `query.includes(key)` — note 'easter' precedes 'easter monday' in
    # both tables, so the 'easter monday' entry is shadowed in the
    # reference and here alike (kept for table parity).
    for key in HOLIDAY_RULES:
        if key in target:
            name, d = holiday_occurrence(key, today, looking_back)
            return {
                "target": target, "name": name,
                "date": d.isoformat(), "days": (d - today).days,
            }
    # aliased spellings the key table misses (apostrophes): "mother's
    # day" → "mothers day" etc. (beyond date.ts, which lowercases only)
    alias = target.replace("'", "")
    for key in HOLIDAY_RULES:
        if key in alias:
            name, d = holiday_occurrence(key, today, looking_back)
            return {
                "target": target, "name": name,
                "date": d.isoformat(), "days": (d - today).days,
            }
    try:
        d = date.fromisoformat(target)
    except ValueError:
        return None
    return {"target": target, "name": "",
            "date": d.isoformat(), "days": (d - today).days}


def parse_unit_query(q: str) -> dict | None:
    """W7: 'convert 3 m to ft' → {qty, from, to, converted}."""
    m = re.search(_UNIT_RE, q.lower())
    if not m:
        return None
    qty, frm, to = float(m.group(1)), m.group(2), m.group(3)
    factor = UNIT_FACTORS.get((frm, to))
    if factor is None:
        return None
    return {"qty": qty, "from": frm, "to": to,
            "converted": round(qty * factor, 4)}


def parse_currency_query(q: str) -> dict | None:
    """W8: '100 usd to eur' against the static rate fixture."""
    m = re.search(_CUR_RE, q.lower())
    if not m:
        return None
    qty, frm, to = float(m.group(1)), m.group(2), m.group(3)
    rf, rt = CURRENCY_RATES_USD.get(frm), CURRENCY_RATES_USD.get(to)
    if rf is None or rt is None:
        return None
    return {"qty": qty, "from": frm, "to": to,
            "converted": round(qty * rf / rt, 4)}


def parse_bang(q: str) -> dict | None:
    """W10: '!g spark shuffle' → redirect URL."""
    m = re.match(_BANG_RE, q.strip())
    if not m:
        return None
    template = BANGS.get(m.group(1))
    if template is None:
        return None
    return {"bang": m.group(1),
            "redirect": template.format(m.group(2).replace(" ", "+"))}


def search_bliptext(articles: DataFrame, q: str, k: int = 5) -> dict:
    """W1 bliptext slot (search.ts:69-70; bliptext.ts:5-29): the
    reference queries an external bliptext wiki endpoint and merges
    ``{scores, bestMatch}`` into the response. External HTTP is out of
    scope here (same sanction as W8's static currency rates), so the
    analog is a static article-table fixture — columns (slug, title,
    content) — with a trigram best-match over titles (the pg_trgm
    2-gram Jaccard shared with W4). Mirrors bliptext.ts exactly at the
    edges: queries shorter than 2 chars, and any lookup failure, return
    the empty SearchResults rather than erroring the search
    (bliptext.ts:6-8,18-26)."""
    norm = (q or "").strip()
    if len(norm) < 2:
        return {"scores": [], "bestMatch": None}
    try:
        rows = (
            articles.select(
                "slug", "title", "content",
                F.round(trigram_score(F.col("title"), norm), 4)
                .alias("score"),
            )
            .filter(F.col("score") > 0)
            .orderBy(F.col("score").desc(), F.col("slug").asc())
            .limit(k)
            .collect()
        )
    except Exception:
        return {"scores": [], "bestMatch": None}
    scores = [{"slug": r["slug"], "title": r["title"],
               "score": r["score"]} for r in rows]
    best = None
    if rows:
        best = {"slug": rows[0]["slug"], "title": rows[0]["title"],
                "content": rows[0]["content"]}
    return {"scores": scores, "bestMatch": best}


def perform_search(
    docs: DataFrame,
    q: str,
    *,
    k: int = 10,
    lang: str | None = None,
    safe: bool = True,
    today: date | None = None,
    summaries: DataFrame | None = None,
    wordnet: DataFrame | None = None,
    bliptext: DataFrame | None = None,
    query_log=None,
    query_log_compact_every: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    index: "pulse.BM25Index | None" = None,
) -> dict:
    """The W1 merge (search.ts:91-99 response shape). ``today`` is
    injectable for determinism; ``query_log`` is an optional
    SnapshotTable receiving the W2 count upsert."""
    norm = q.strip().lower()
    out: dict = {"query": norm}

    bang = parse_bang(q)
    if bang is not None:
        # bangs short-circuit: the reference redirects without searching
        out["bang"] = bang
        return out

    if query_log is not None:
        # W2 (search.ts:126-144): count = count + 1 on the normalized
        # query. Scale shape: APPEND an increment row (O(1) per search)
        # and let reads roll up with the existing W2 rollup operator —
        # the old read-modify-write upsert rewrote the whole log table
        # per request. Compaction = periodic rollup + replace.
        spark = docs.sparkSession
        query_log.commit(
            spark.createDataFrame([(norm, 1)], "query string, count long"),
            "append", {"op": "w2_increment"},
        )
        # compaction trigger: once the increment tail (appends since the
        # last replace) reaches query_log_compact_every, fold the log
        # into one row per query — the read-back below then scans
        # O(distinct queries + tail), not O(total searches). This is the
        # Iceberg rewrite_data_files maintenance analog, inline because
        # the reference's upsert keeps the table compact by construction
        # (search.ts:126-144).
        if query_log_compact_every:
            snaps = query_log.snapshots()
            tail = 0
            for s_ in reversed(snaps):
                if s_.mode == "replace":
                    break
                tail += 1
            if tail >= query_log_compact_every:
                rolled = (
                    query_log.read().groupBy("query")
                    .agg(F.sum("count").cast("long").alias("count"))
                )
                query_log.commit(
                    rolled, "replace", {"op": "w2_compact"}, coalesce=1
                )
        n = (
            query_log.read().filter(F.col("query") == norm)
            .agg(F.sum("count").alias("n")).collect()[0]["n"]
        )
        out["query_count"] = int(n)

    today = today or date.today()
    out["date"] = parse_date_query(norm, today)
    out["unitConversion"] = parse_unit_query(norm)
    out["currency"] = parse_currency_query(norm)
    out["math"] = math_eval(norm) if any(c in norm for c in "+-*/^") else None

    if summaries is not None:
        # W5: exact-match cache hit on the normalized query
        hit = (
            summaries.filter(~F.col("is_null"))
            .filter(F.col("query") == norm)
            .select("summary")
            .collect()
        )
        out["ai_summary"] = hit[0]["summary"] if hit else None

    if bliptext is not None:
        # W1 bliptext fan-out slot (search.ts:69-70): best-match wiki
        # article merged as {type, article} or None, reference shape
        res = search_bliptext(bliptext, q)
        out["bliptext"] = (
            {"type": "bliptext", "article": res["bestMatch"]}
            if res["bestMatch"] else None
        )

    if wordnet is not None:
        # W4: trigram fuzzy word lookup (single-word queries only, like
        # the reference's meaning-word stripping)
        word = norm.split()[0] if norm.split() else ""
        out["word"] = [
            r.asDict()
            for r in trigram_similarity(
                wordnet, word, threshold=0.3, k=5, text_col="word"
            ).collect()
        ]

    # web search (3.2): server-side NOT nsfw:true unless opted out.
    # With a materialized index this reads only the query terms' postings
    # (pulse serves committed segments, server.rs:75-77); the raw-corpus
    # scan is the ad-hoc fallback only.
    web_q = q if not safe else f"{q} NOT nsfw:true"
    if index is not None:
        hits = pulse.search_index(index, web_q, k=k, id_col=id_col, lang=lang)
    else:
        base = pulse.nsfw_flag(docs, []) if "nsfw" not in docs.columns else docs
        hits = pulse.search(
            base, web_q, k=k, text_col=text_col, id_col=id_col, lang=lang
        )
    out["web"] = [r.asDict() for r in hits.collect()]
    out["web_total"] = len(out["web"])
    return out
