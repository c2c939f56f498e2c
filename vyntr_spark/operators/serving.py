"""Serving-layer operators (SURVEY.md §2.5, reference website/ +
lexicon/): query-count rollups, autocomplete, trigram fuzzy match, date
math, JSON scalar access. Peripheral to the crawl north rule but part of
the reference's query surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def query_count_rollup(events: DataFrame) -> DataFrame:
    """W2 (search.ts:126-144): normalized key, count per key (the
    'count = count + 1 on conflict' upsert expressed as a rollup)."""
    return (
        events.select(F.lower(F.trim(F.col("event_type"))).alias("query"))
        .groupBy("query")
        .agg(F.count("*").alias("cnt"))
    )


def autocomplete(df: DataFrame, prefix: str, k: int = 10,
                 text_col: str = "word", count_col: str = "cnt") -> DataFrame:
    """W3 (api/autocomplete/+server.ts:6-23): prefix match, order by count
    desc, limit 10 (ties broken by word)."""
    if len(prefix) < 2:
        return df.sparkSession.createDataFrame([], f"{text_col} string, {count_col} bigint")
    return (
        df.filter(F.col(text_col).startswith(prefix))
        .orderBy(F.col(count_col).desc(), F.col(text_col).asc())
        .limit(k)
    )


def trigram_score(col, query: str):
    """2-gram-Jaccard similarity Column between ``col`` and a literal
    query (the pg_trgm stand-in shared by W4 fuzzy lookup and the W1
    bliptext best-match slot). Pure native exprs, zero shuffle."""
    def grams(c):
        n = F.length(c)
        idx = F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1)))
        return F.array_distinct(
            F.filter(
                F.transform(idx, lambda i: c.substr(i, F.lit(2))),
                lambda g: F.length(g) == 2,
            )
        )

    gw, gq = grams(F.lower(col)), grams(F.lower(F.lit(query)))
    inter = F.size(F.array_intersect(gw, gq))
    union = F.size(F.array_union(gw, gq))
    return F.when(union > 0, inter.cast("double") / union).otherwise(
        F.lit(0.0)
    )


def trigram_similarity(df: DataFrame, query: str, threshold: float = 0.3,
                       k: int = 10, text_col: str = "word") -> DataFrame:
    """W4 (wordnet.ts:20-77): pg_trgm-style fuzzy match. Similarity =
    Jaccard over 2-gram character sets (documented stand-in for pg_trgm's
    padded trigrams). Exact matches first, then similarity desc, limit 10."""
    w = F.lower(F.col(text_col))
    q = F.lower(F.lit(query))
    sim = trigram_score(F.col(text_col), query)
    return (
        df.select(
            F.col(text_col),
            (w == q).cast("int").alias("exact"),
            F.round(sim, 4).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .orderBy(F.col("exact").desc(), F.col("sim").desc(), F.col(text_col).asc())
        .limit(k)
    )


def days_until(events: DataFrame, target_date: str) -> DataFrame:
    """W6-style date math: datediff to a fixed date per event day."""
    return events.select(
        "event_id",
        F.datediff(F.lit(target_date).cast("date"), F.col("ts").cast("date")).alias(
            "days_left"
        ),
    )


def json_prop(events: DataFrame, field: str = "k") -> DataFrame:
    """JSON scalar access over the props column (from_json/get_json_object
    family — the reference stores JSONB, SURVEY.md §1.3)."""
    return events.select(
        "event_id",
        F.get_json_object(F.col("props"), f"$.{field}").cast("int").alias("prop_k"),
    )


# ---------------------------------------------------------------------------
# Instant answers: math eval (W9), date computus (W6), unit conversion (W7)
# ---------------------------------------------------------------------------

import math as _math  # noqa: E402
import re as _re  # noqa: E402
from datetime import date as _date  # noqa: E402

_FUNCS = {
    "sin": _math.sin, "cos": _math.cos, "tan": _math.tan,
    "sqrt": _math.sqrt, "abs": abs, "log": _math.log10, "ln": _math.log,
    "round": round, "floor": _math.floor, "ceil": _math.ceil,
}
_CONSTS = {"pi": _math.pi, "e": _math.e}
_OPS = {"+": (1, lambda a, b: a + b), "-": (1, lambda a, b: a - b),
        "*": (2, lambda a, b: a * b), "/": (2, lambda a, b: a / b),
        "^": (3, lambda a, b: a ** b)}


def math_eval(expr: str) -> float | None:
    """W9 (website/src/lib/utils/math.ts:1-146 semantics): shunting-yard
    evaluator — + - * / ^, functions sin cos tan sqrt abs log ln round
    floor ceil, constants pi/e. Returns None on any parse/eval error
    (driver-side pure function, not a table operator)."""
    # tokenize in place (collapsing spaces first would merge "1 2" -> 12)
    toks = _re.findall(r"\d+\.?\d*|[a-z]+|[()+\-*/^,]", expr.lower())
    if not toks:
        return None
    out: list[float] = []
    ops: list[str] = []

    def apply(op: str) -> bool:
        if op in _FUNCS:
            if not out:
                return False
            out.append(float(_FUNCS[op](out.pop())))
            return True
        if len(out) < 2:
            return False
        b, a = out.pop(), out.pop()
        out.append(_OPS[op][1](a, b))
        return True

    prev = None
    try:
        for t in toks:
            if _re.fullmatch(r"\d+\.?\d*", t):
                out.append(float(t))
            elif t in _CONSTS:
                out.append(_CONSTS[t])
            elif t in _FUNCS:
                ops.append(t)
            elif t == "(":
                ops.append(t)
            elif t == ",":
                while ops and ops[-1] != "(":
                    if not apply(ops.pop()):
                        return None
            elif t == ")":
                while ops and ops[-1] != "(":
                    if not apply(ops.pop()):
                        return None
                if not ops:
                    return None
                ops.pop()
                if ops and ops[-1] in _FUNCS:
                    if not apply(ops.pop()):
                        return None
            elif t in _OPS:
                if t == "-" and (prev is None or prev in _OPS or prev == "("):
                    # unary minus: 0-x applied immediately, no precedence pop
                    out.append(0.0)
                    ops.append("-")
                    prev = t
                    continue
                while (
                    ops and ops[-1] in _OPS
                    and (_OPS[ops[-1]][0] > _OPS[t][0]
                         or (_OPS[ops[-1]][0] == _OPS[t][0] and t != "^"))
                ):
                    if not apply(ops.pop()):
                        return None
                ops.append(t)
            else:
                return None
            prev = t
        while ops:
            op = ops.pop()
            if op == "(" or not apply(op):
                return None
        return out[0] if len(out) == 1 else None
    except (ValueError, ZeroDivisionError, OverflowError):
        return None


def easter_date(year: int) -> _date:
    """W6: Gregorian Easter (Meeus/Jones/Butcher computus — the algorithm
    the reference's holiday table uses, website/src/lib/utils/date.ts)."""
    a = year % 19
    b, c = divmod(year, 100)
    d, e = divmod(b, 4)
    f = (b + 8) // 25
    g = (b - f + 1) // 3
    h = (19 * a + b - d - g + 15) % 30
    i, k = divmod(c, 4)
    l = (32 + 2 * e + 2 * i - h - k) % 7  # noqa: E741
    m = (a + 11 * h + 22 * l) // 451
    month = (h + l - 7 * m + 114) // 31
    day = ((h + l - 7 * m + 114) % 31) + 1
    return _date(year, month, day)


def nth_weekday(year: int, month: int, weekday: int, n: int) -> _date:
    """W6: Nth-weekday holiday rule (e.g. 4th Thursday of November)."""
    d = _date(year, month, 1)
    offset = (weekday - d.weekday()) % 7
    return _date(year, month, 1 + offset + 7 * (n - 1))


# W7 (unitParser.ts/units.ts subset): category-scoped factor table
UNIT_FACTORS = {
    ("m", "ft"): 3.28084, ("ft", "m"): 0.3048,
    ("km", "mi"): 0.621371, ("mi", "km"): 1.609344,
    ("kg", "lb"): 2.204623, ("lb", "kg"): 0.453592,
    ("l", "gal"): 0.264172, ("gal", "l"): 3.785412,
}

_UNIT_RE = (
    r"(?:convert\s+)?([0-9]+(?:\.[0-9]+)?)\s*([a-z]+)\s+(?:to|in)\s+([a-z]+)"
)


def unit_convert_df(df: DataFrame, query_col: str = "q") -> DataFrame:
    """W7: regex parse 'convert X a to b' / 'X a in b' + broadcast factor
    join — all native expressions."""
    spark = df.sparkSession
    factors = spark.createDataFrame(
        [(a, b, f) for (a, b), f in UNIT_FACTORS.items()],
        "from_unit string, to_unit string, factor double",
    )
    parsed = df.select(
        query_col,
        F.regexp_extract(F.lower(F.col(query_col)), _UNIT_RE, 1).cast("double").alias("qty"),
        F.regexp_extract(F.lower(F.col(query_col)), _UNIT_RE, 2).alias("from_unit"),
        F.regexp_extract(F.lower(F.col(query_col)), _UNIT_RE, 3).alias("to_unit"),
    ).filter(F.col("from_unit") != "")
    return parsed.join(F.broadcast(factors), ["from_unit", "to_unit"]).select(
        query_col, "from_unit", "to_unit",
        F.round(F.col("qty") * F.col("factor"), 4).alias("converted"),
    )


# W8 (currency.ts:4-50): symbol/code table; rates are a static fixture
# (the reference hits a live-rate API; no network here — SURVEY.md §2.5)
CURRENCY_RATES_USD = {
    "usd": 1.0, "eur": 1.08, "gbp": 1.27, "jpy": 0.0067, "btc": 65000.0,
}

_CUR_RE = (
    r"(?:convert\s+)?([0-9]+(?:\.[0-9]+)?)\s*([a-z]{3})\s+(?:to|in)\s+([a-z]{3})"
)


def currency_convert_df(df: DataFrame, query_col: str = "q") -> DataFrame:
    """W8: regex parse '100 usd to eur' + double broadcast rate join
    (from- and to-currency), converted = qty * rate_from / rate_to."""
    spark = df.sparkSession
    rates = spark.createDataFrame(
        list(CURRENCY_RATES_USD.items()), "cur string, usd_rate double"
    )
    parsed = df.select(
        query_col,
        F.regexp_extract(F.lower(F.col(query_col)), _CUR_RE, 1).cast("double").alias("qty"),
        F.regexp_extract(F.lower(F.col(query_col)), _CUR_RE, 2).alias("from_cur"),
        F.regexp_extract(F.lower(F.col(query_col)), _CUR_RE, 3).alias("to_cur"),
    ).filter(F.col("from_cur") != "")
    fr = F.broadcast(rates.select(F.col("cur").alias("from_cur"),
                                  F.col("usd_rate").alias("rate_from")))
    to = F.broadcast(rates.select(F.col("cur").alias("to_cur"),
                                  F.col("usd_rate").alias("rate_to")))
    return parsed.join(fr, "from_cur").join(to, "to_cur").select(
        query_col, "from_cur", "to_cur",
        F.round(F.col("qty") * F.col("rate_from") / F.col("rate_to"), 4)
        .alias("converted"),
    )


# W10 (bangs.ts:1-30): static !bang → url-template lookup (108k entries in
# the reference; representative subset here — the operator is the same
# broadcast join at any table size)
BANGS = {
    "g": "https://www.google.com/search?q={}",
    "w": "https://en.wikipedia.org/wiki/{}",
    "gh": "https://github.com/search?q={}",
    "yt": "https://www.youtube.com/results?search_query={}",
    "ddg": "https://duckduckgo.com/?q={}",
}

_BANG_RE = r"^!([a-z]+)\s+(.+)$"


def bang_redirect(df: DataFrame, query_col: str = "q") -> DataFrame:
    """W10: parse '!bang term', broadcast-join the bang table, substitute
    the ('+'-joined) term into the url template."""
    spark = df.sparkSession
    bangs = spark.createDataFrame(
        list(BANGS.items()), "bang string, template string"
    )
    parsed = df.select(
        query_col,
        F.regexp_extract(F.col(query_col), _BANG_RE, 1).alias("bang"),
        F.regexp_extract(F.col(query_col), _BANG_RE, 2).alias("term"),
    ).filter(F.col("bang") != "")
    return parsed.join(F.broadcast(bangs), "bang").select(
        query_col, "bang",
        F.replace(
            F.col("template"), F.lit("{}"),
            F.replace(F.col("term"), F.lit(" "), F.lit("+")),
        ).alias("redirect_url"),
    )


def summary_cache_lookup(queries_df: DataFrame, cache_df: DataFrame,
                         query_col: str = "query") -> DataFrame:
    """W5 (search.ts:49-59): exact-match broadcast lookup of the
    normalized query in the AI-summary cache (isNull==false rows only)."""
    return queries_df.select(
        F.lower(F.trim(F.col(query_col))).alias("query")
    ).join(
        F.broadcast(cache_df.filter(~F.col("is_null"))), "query", "inner"
    ).select("query", "summary")


def api_key_auth(requests: DataFrame, keys: DataFrame,
                 key_col: str = "api_key",
                 id_col: str = "request_id") -> DataFrame:
    """W11 (website/src/routes/api/v1/search/+server.ts:15-46): Bearer
    API-key gate. Missing/empty key -> 401 'API key required'; unknown
    key -> 401 'Invalid API key'; else 200 with the key's user.
    The key table is a dimension -> broadcast left join, no shuffle of
    the request stream."""
    k = keys.select(F.col("key").alias(key_col), F.col("user_id"))
    joined = requests.join(F.broadcast(k), key_col, "left")
    missing = F.col(key_col).isNull() | (F.col(key_col) == "")
    status = (
        F.when(missing, F.lit(401))
        .when(F.col("user_id").isNull(), F.lit(401))
        .otherwise(F.lit(200))
    )
    err = (
        F.when(missing, F.lit("API key required"))
        .when(F.col("user_id").isNull(), F.lit("Invalid API key"))
    )
    # passthrough of every request column (e.g. the date the usage
    # rollup meters on) + the auth verdict
    return joined.select(
        *[F.col(c) for c in requests.columns],
        status.alias("status"),
        err.alias("error"),
        "user_id",
    )


def api_usage_rollup(auth_df: DataFrame, date_col: str = "date") -> DataFrame:
    """W11 usage metering (+server.ts:48-77): per-(user, day) request
    counter. The reference does a read-modify-write per request; at scale
    each authorized request is an increment event and THIS rollup is the
    aggregation (same shape as the W2 query-log fix) — one hash agg with
    map-side combine."""
    return (
        auth_df.filter(F.col("status") == 200)
        .groupBy("user_id", date_col)
        .agg(F.count("*").alias("count"))
    )


def last_weekday(year: int, month: int, weekday: int) -> _date:
    """W6: last-weekday-of-month rule (date.ts getLastDayOfMonth)."""
    nxt = _date(year + 1, 1, 1) if month == 12 else _date(year, month + 1, 1)
    from datetime import timedelta as _td

    d = nxt - _td(days=1)
    return d - _td(days=(d.weekday() - weekday) % 7)


def _easter_offset(delta_days: int):
    from datetime import timedelta as _td

    return lambda y: easter_date(y) + _td(days=delta_days)


# W6 full holiday table (date.ts:185-306 — keys, display names and rules
# mirrored; matching is substring over the query like the reference's
# query.includes(key), in the same insertion order). Python weekday
# numbering: Mon=0..Sun=6 (date.ts uses JS Sun=0).
HOLIDAY_RULES: dict = {
    "new year": ("New Year's Day", lambda y: _date(y, 1, 1)),
    "juneteenth": ("Juneteenth", lambda y: _date(y, 6, 19)),
    "valentines": ("Valentine's Day", lambda y: _date(y, 2, 14)),
    "st patricks": ("St. Patrick's Day", lambda y: _date(y, 3, 17)),
    "april fools": ("April Fools' Day", lambda y: _date(y, 4, 1)),
    "canada day": ("Canada Day", lambda y: _date(y, 7, 1)),
    "independence day": ("Independence Day (US)", lambda y: _date(y, 7, 4)),
    "halloween": ("Halloween", lambda y: _date(y, 10, 31)),
    "veterans day": ("Veterans Day (US)", lambda y: _date(y, 11, 11)),
    "christmas": ("Christmas Day", lambda y: _date(y, 12, 25)),
    "boxing day": ("Boxing Day", lambda y: _date(y, 12, 26)),
    "easter": ("Easter Sunday", easter_date),
    "good friday": ("Good Friday", _easter_offset(-2)),
    "easter monday": ("Easter Monday", _easter_offset(1)),
    "mlk day": ("Martin Luther King, Jr. Day",
                lambda y: nth_weekday(y, 1, 0, 3)),
    "presidents day": ("Presidents' Day (US)",
                       lambda y: nth_weekday(y, 2, 0, 3)),
    "mothers day": ("Mother's Day (US)", lambda y: nth_weekday(y, 5, 6, 2)),
    "memorial day": ("Memorial Day (US)", lambda y: last_weekday(y, 5, 0)),
    "fathers day": ("Father's Day (US)", lambda y: nth_weekday(y, 6, 6, 3)),
    "labor day": ("Labor Day (US)", lambda y: nth_weekday(y, 9, 0, 1)),
    "columbus day": ("Columbus Day / Indigenous Peoples' Day (US)",
                     lambda y: nth_weekday(y, 10, 0, 2)),
    "thanksgiving": ("Thanksgiving Day (US)",
                     lambda y: nth_weekday(y, 11, 3, 4)),
}


def holiday_occurrence(key: str, today: _date,
                       looking_back: bool = False) -> tuple[str, _date] | None:
    """(display name, date) for a holiday key: the NEXT occurrence at or
    after today (date.ts getDateFixed/getDateVariable forward branch), or
    the most recent at-or-before occurrence when looking back
    ('since'/'from' queries)."""
    entry = HOLIDAY_RULES.get(key)
    if entry is None:
        return None
    name, rule = entry
    this_year = rule(today.year)
    if looking_back:
        d = this_year if this_year <= today else rule(today.year - 1)
    else:
        d = this_year if this_year >= today else rule(today.year + 1)
    return name, d


def rrf_fuse(ranked_a: DataFrame, ranked_b: DataFrame, k: int = 60,
             topk: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. SIGIR'09) — the standard
    way a serving path combines two ranked lists (two query variants,
    or BM25 + ANN in hybrid search): score(d) = Σ 1/(k + rank_i(d))
    over the lists that contain d. Rank-based, so the two lists'
    incomparable raw scores never mix; k=60 is the published default.

    Inputs are (id, rank) frames (rank 1-based ints). Full-outer join on
    the id — both lists are already top-N sized, so this is trivially
    broadcastable at serving scale. The fused score is the same 2-term
    IEEE sum on both engines (fixed term order, coalesce(·,0) for
    absent), so the (score desc, id) top-k is deterministic."""
    a = ranked_a.select(F.col(id_col).alias("id"),
                        F.col("rank").alias("ra"))
    b = ranked_b.select(F.col(id_col).alias("id"),
                        F.col("rank").alias("rb"))
    j = a.join(b, "id", "full_outer")
    score = (
        F.coalesce(F.lit(1.0) / (F.lit(k) + F.col("ra")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(k) + F.col("rb")), F.lit(0.0))
    )
    return (
        j.select(F.col("id").alias(id_col), score.alias("_s"))
        .orderBy(F.col("_s").desc(), id_col)
        .limit(topk)
        .select(id_col, F.round("_s", 6).alias("rrf_score"))
    )


# W6c: TIME_UNITS (time.ts:3-40 — multipliers FROM milliseconds, data
# mirrored; insertion order matters, it is the regex alternation order)
TIME_UNITS: dict[str, tuple[float, int]] = {
    "quectoseconds": (1e30 * 1e9, 0), "rontoseconds": (1e27 * 1e9, 0),
    "yoctoseconds": (1e24 * 1e9, 0), "zeptoseconds": (1e21 * 1e9, 0),
    "attoseconds": (1e18 * 1e9, 0), "femtoseconds": (1e15 * 1e9, 0),
    "picoseconds": (1e12 * 1e9, 0), "nanoseconds": (1_000_000, 0),
    "microseconds": (1000, 0), "milliseconds": (1, 0),
    "centiseconds": (1 / 10, 1), "deciseconds": (1 / 100, 1),
    "seconds": (1 / 1000, 1), "decaseconds": (1 / 1000 / 10, 1),
    "minutes": (1 / 1000 / 60, 1), "hours": (1 / 1000 / 60 / 60, 1),
    "days": (1 / 1000 / 60 / 60 / 24, 1),
    "weeks": (1 / 1000 / 60 / 60 / 24 / 7, 1),
    "months": (1 / 1000 / 60 / 60 / 24 / 30.44, 1),
    "years": (1 / 1000 / 60 / 60 / 24 / 365.25, 1),
    "decades": (1 / 1000 / 60 / 60 / 24 / 365.25 / 10, 1),
    "centuries": (1 / 1000 / 60 / 60 / 24 / 365.25 / 100, 1),
    "millennia": (1 / 1000 / 60 / 60 / 24 / 365.25 / 1000, 1),
    "megaannums": (1 / 1000 / 60 / 60 / 24 / 365.25 / 1e6, 1),
    "eons": (1 / 1000 / 60 / 60 / 24 / 365.25 / 1e9, 1),
}

_UNIT_ALTERNATION = "|".join(TIME_UNITS)
# date.ts:10-11 — UNIT_PATTERN finds the unit anywhere; QUERY_PATTERN
# strips the leading "how many <unit> until/before/to/since/from "
TIME_UNIT_PATTERN = rf"\b({_UNIT_ALTERNATION})\b"
DATE_QUERY_PREFIX = (
    rf"^(how many )?({_UNIT_ALTERNATION}) (until|before|to|since|from) "
)


# W6d: month-name table for the bounded free-text date fallback. V8's
# new Date(query) accepts full month names and their 3-letter
# abbreviations case-insensitively; longer prefixes ('janu') also parse
# in V8 but are outside the documented bound.
MONTHS: dict[str, int] = {}
for _i, _mn in enumerate(
    ["january", "february", "march", "april", "may", "june", "july",
     "august", "september", "october", "november", "december"], 1,
):
    MONTHS[_mn] = _i
    MONTHS[_mn[:3]] = _i
_MD_DAY = r"(\d{1,2})"
_MD_MON = r"([a-z]+)"
FREETEXT_ISO = r"^(\d{4}-\d{2}-\d{2})$"
FREETEXT_DMY = rf"^{_MD_DAY} {_MD_MON} (\d{{4}})$"
FREETEXT_MDY = rf"^{_MD_MON} {_MD_DAY},? (\d{{4}})$"
FREETEXT_MD = rf"^{_MD_MON} {_MD_DAY}$"
# V8 quirk, kept for parity: a month-day string WITHOUT a year resolves
# to year 2001 (new Date('August 19') -> Aug 19 2001), not the current
# year
FREETEXT_NOYEAR = 2001


def parse_date_query_df(df: DataFrame, query_col: str = "q",
                        today: str = "2025-06-15",
                        freetext: bool = False) -> DataFrame:
    """parseDateQuery parity (date.ts:308-360) over a DataFrame of query
    strings, with 'now' PINNED to ``today`` midnight UTC so the result
    is deterministic and oracle-checkable (the reference reads the wall
    clock; every downstream branch only compares calendar dates, so a
    pinned date exercises identical logic).

    Covered grammar: unit detection (TIME_UNIT_PATTERN — no unit, no
    result), lookingBack on 'since'/'from' substrings, prefix strip,
    holiday substring match in HOLIDAY_RULES insertion order (the
    reference's Object.entries loop), and the 'tomorrow' literal. With
    ``freetext=True`` (W6d) the trailing JS ``new Date(query)``
    fallback is covered for the shapes V8 resolves deterministically
    (ISO date, 'D month YYYY', 'month D[,] YYYY', year-less 'month D'
    -> 2001); the rest of V8's date grammar remains engine-specific
    and unported (documented bound, SURVEY §2.5).

    Returns (query_col, unit, description, target_date, delta_ms,
    amount): delta_ms = (target - today) in milliseconds (date.ts:327),
    amount = formatTimeDifference's rounded |delta| in the requested
    unit (time.ts:42-50). Holiday dates for today/today±1y are
    precomputed driver-side from HOLIDAY_RULES (22 rows x 2 — a literal
    array in the plan); everything else is native expressions."""
    from datetime import timedelta as _td

    t0 = _date.fromisoformat(today)
    rows = []
    for key, (name, rule) in HOLIDAY_RULES.items():
        this_year = rule(t0.year)
        fwd = this_year if this_year >= t0 else rule(t0.year + 1)
        back = this_year if this_year <= t0 else rule(t0.year - 1)
        rows.append((key, name, fwd.isoformat(), back.isoformat()))
    hol_arr = F.array(*[
        F.struct(
            F.lit(k).alias("key"), F.lit(n).alias("name"),
            F.lit(fw).alias("fwd"), F.lit(bk).alias("back"),
        )
        for k, n, fw, bk in rows
    ])

    ql = F.lower(F.col(query_col))
    unit = F.nullif(F.regexp_extract(ql, TIME_UNIT_PATTERN, 1), F.lit(""))
    looking_back = ql.contains("since") | ql.contains("from")
    stripped = F.regexp_replace(ql, DATE_QUERY_PREFIX, "")

    matches = F.filter(hol_arr, lambda h: stripped.contains(h["key"]))
    # first in insertion order; try_element_at -> null on no match
    # (plain element_at raises under ANSI mode on the empty array)
    hol = F.try_element_at(matches, F.lit(1))

    target = (
        F.when(hol.isNotNull(),
               F.when(looking_back, hol["back"]).otherwise(hol["fwd"]))
        .when(stripped == "tomorrow",
              F.lit((t0 + _td(days=1)).isoformat()))
    ).cast("date")
    desc = (
        F.when(hol.isNotNull(), hol["name"])
        .when(stripped == "tomorrow", F.lit("Tomorrow"))
    )

    if freetext:
        # W6d — the trailing new Date(query) fallback (date.ts:344-351),
        # BOUNDED to the shapes V8 resolves deterministically: ISO
        # YYYY-MM-DD (strict — Feb 30 is Invalid Date), 'D month YYYY',
        # 'month D[,] YYYY', and year-less 'month D' (-> 2001, the V8
        # default-year quirk). Out-of-range days 1-31 roll over exactly
        # like JS Date (Feb 30 2027 -> Mar 2 2027) via first-of-month +
        # (day-1); createResult passes description '' on this branch.
        def _mon_num(tok):
            e = F.lit(None).cast("int")
            for name, num in MONTHS.items():
                e = F.when(tok == name, F.lit(num)).otherwise(e)
            return e

        def _int(tok):
            # regexp_extract yields '' on no match; nullif keeps the
            # cast ANSI-safe (the regexes only ever capture digits)
            return F.nullif(tok, F.lit("")).cast("int")

        def _day(tok):
            d = _int(tok)
            return F.when((d >= 1) & (d <= 31), d)

        def _roll(y, m, d):
            # JS rollover: new Date(y, m, d) == first-of-month + (d-1)
            return F.date_add(F.make_date(y, m, F.lit(1)), d - F.lit(1))

        iso = F.when(
            stripped.rlike(FREETEXT_ISO),
            F.try_to_timestamp(stripped, F.lit("yyyy-MM-dd")).cast("date"),
        )
        dmy = _roll(
            _int(F.regexp_extract(stripped, FREETEXT_DMY, 3)),
            _mon_num(F.regexp_extract(stripped, FREETEXT_DMY, 2)),
            _day(F.regexp_extract(stripped, FREETEXT_DMY, 1)),
        )
        mdy = _roll(
            _int(F.regexp_extract(stripped, FREETEXT_MDY, 3)),
            _mon_num(F.regexp_extract(stripped, FREETEXT_MDY, 1)),
            _day(F.regexp_extract(stripped, FREETEXT_MDY, 2)),
        )
        md = _roll(
            F.lit(FREETEXT_NOYEAR),
            _mon_num(F.regexp_extract(stripped, FREETEXT_MD, 1)),
            _day(F.regexp_extract(stripped, FREETEXT_MD, 2)),
        )
        ft = F.coalesce(iso, dmy, mdy, md)
        target = F.coalesce(target, ft)
        desc = F.coalesce(desc, F.when(ft.isNotNull(), F.lit("")))
    delta_ms = (
        F.datediff(target, F.lit(today).cast("date")).cast("long")
        * F.lit(86_400_000)
    )

    # formatTimeDifference: |ms| * multiplier, rounded to the unit's
    # decimals — one multiply per unit with the SAME float literal the
    # oracle uses, so both engines do one identical IEEE op
    amount = F.lit(None).cast("double")
    for uname, (mult, dec) in TIME_UNITS.items():
        amount = F.when(
            unit == uname,
            F.round(F.abs(delta_ms).cast("double") * F.lit(mult), dec),
        ).otherwise(amount)

    keep = unit.isNotNull() & target.isNotNull()
    return df.select(
        *df.columns,
        F.when(keep, unit).alias("unit"),
        F.when(keep, desc).alias("description"),
        F.when(keep, target.cast("string")).alias("target_date"),
        F.when(keep, delta_ms).alias("delta_ms"),
        F.when(keep, amount).alias("amount"),
    )


def oracle_time_units_values() -> str:
    """DuckDB VALUES rows (unit, multiplier, decimals) generated from
    the same TIME_UNITS dict — no drift."""
    return ",".join(
        f"('{u}',{m!r},{d})" for u, (m, d) in TIME_UNITS.items()
    )


def oracle_month_values() -> str:
    """DuckDB VALUES rows (name, num) from the same MONTHS table as the
    W6d free-text fallback — no drift."""
    return ",".join(f"('{n}',{m})" for n, m in MONTHS.items())


def oracle_holiday_values(today: str = "2025-06-15") -> str:
    """DuckDB VALUES rows (ord, key, name, fwd, back) from the same
    HOLIDAY_RULES table and pinned date as parse_date_query_df."""
    from datetime import date as _d

    t0 = _d.fromisoformat(today)
    out = []
    for i, (key, (name, rule)) in enumerate(HOLIDAY_RULES.items()):
        this_year = rule(t0.year)
        fwd = this_year if this_year >= t0 else rule(t0.year + 1)
        back = this_year if this_year <= t0 else rule(t0.year - 1)
        nm = name.replace("'", "''")
        out.append(f"({i},'{key}','{nm}',DATE '{fwd}',DATE '{back}')")
    return ",".join(out)
