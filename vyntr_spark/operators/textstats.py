"""Training-data-pipeline text operators: language ID, quality scoring,
token counting, fingerprinting, and fuzzy deduplication (exact, MinHash
+LSH, SimHash, n-gram Jaccard). All native expressions; hash primitives
use md5 (identical hex output in Spark and DuckDB, so every operator has
an exact SQL oracle).

MinHash formulation: the i-th permutation is "order shingles by
md5(i || shingle)"; the signature component is the lexicographic MIN of
those hex digests — a standard hash-min sketch that needs no custom UDF
on either engine. Band buckets concatenate signature components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "que", "pour", "dans"],
    "es": ["el", "la", "de", "y", "es", "un", "una", "que", "por", "con"],
}

TOKEN_SPLIT = "[^a-z0-9]+"


def _token_array(col):
    return F.array_remove(F.split(F.lower(col), TOKEN_SPLIT), "")


# Logical-plan node classes whose presence means the data is already
# re-parallelized by a shuffle (or row counts change under a Generate),
# so widen_small_scan must leave the frame alone. "Distinct" appears as
# Deduplicate in analyzed plans; both are listed defensively.
_RESHUFFLING_NODES = frozenset(
    {
        "Join", "Aggregate", "Window", "Sort", "Deduplicate", "Distinct",
        "Repartition", "RepartitionByExpression", "Generate",
    }
)

# (session id, analyzed-plan semanticHash) -> scan partition count.
_SCAN_PROBE_CACHE: dict = {}


def widen_small_scan(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Repartition an input whose scan yields fewer partitions than the
    session's core count — the single-row-group small-file guard for
    explode-heavy operators.

    Parquet splits only at row-group boundaries, so a small fixture
    file with ONE row group pins every downstream explode/hash stage to
    one task no matter how many cores the session has (measured: the
    dedup-verdict composition ran its shingle+md5 passes on 1 of 32
    cores at sf0.1). At warehouse scale scans split by
    spark.sql.files.maxPartitionBytes into far more partitions than
    cores and this returns the input UNCHANGED — the extra shuffle
    exists only where the data is tiny enough for it to cost
    milliseconds. Hash-partitioning on ``key`` keeps placement
    deterministic (round-robin would depend on input row order).

    Derived inputs (anything whose plan already contains a join,
    aggregate, window, or repartition) are returned untouched WITHOUT
    the partition probe: their shuffles already re-parallelize the
    data, and probing them via ``df.rdd`` would force physical
    planning — under AQE that can eagerly EXECUTE the upstream shuffle
    stages just to count partitions, work the real query then redoes.
    The probe therefore only ever runs on plain scan/filter/project
    lineage, where ``.rdd`` is a metadata-only conversion.

    Classification walks the analyzed logical plan's NODE CLASSES
    (``nodeName`` per node, depth-first via py4j) rather than regexing
    the plan's ``toString()`` — a column alias or string literal that
    happens to contain "Join"/"Sort"/... must not silently disable the
    widening. The probe result is memoized per (session, plan
    semanticHash) so repeated calls over the same scan lineage — common
    across a bench/gate run — force physical planning only once."""
    plan = df._jdf.queryExecution().analyzed()
    stack = [plan]
    while stack:
        node = stack.pop()
        if node.nodeName() in _RESHUFFLING_NODES:
            return df
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    cache_key = (id(df.sparkSession), plan.semanticHash())
    n_parts = _SCAN_PROBE_CACHE.get(cache_key)
    if n_parts is None:
        n_parts = df.rdd.getNumPartitions()
        if len(_SCAN_PROBE_CACHE) > 256:  # bound driver-side memory
            _SCAN_PROBE_CACHE.clear()
        _SCAN_PROBE_CACHE[cache_key] = n_parts
    if n_parts >= par:
        return df
    k = key if key in df.columns else df.columns[0]
    return df.repartition(par, k)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """E10-style token counting (price.py analog; whitespace+punct
    tokenizer documented in place of tiktoken — no model downloads)."""
    return df.select(
        F.col("doc_id"), F.size(_token_array(F.col(text_col))).alias("n_tokens")
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: length, mean word length, stopword ratio,
    punctuation ratio. Score = weighted sum, rounded 4dp."""
    toks = _token_array(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    mean_wlen = F.when(n_tok > 0, (n_chars.cast("double") / n_tok)).otherwise(F.lit(0.0))
    stop_en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    # count occurrences (array_intersect would dedup) for a true ratio
    n_stop_occ = F.size(F.filter(toks, lambda t: F.array_contains(stop_en, t)))
    stop_ratio = F.when(n_tok > 0, n_stop_occ.cast("double") / n_tok).otherwise(F.lit(0.0))
    punct = F.length(F.regexp_replace(F.col(text_col), "[^.,;:!?]", ""))
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    score = (
        F.least(n_tok.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2
    )
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language ID via stopword-hit ratio per language; argmax with
    deterministic tiebreak on language code; 'und' when nothing hits."""
    toks = _token_array(F.col(text_col))
    n_tok = F.size(toks)
    scores = []
    for lang, words in sorted(STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        ratio = F.when(n_tok > 0, hits.cast("double") / n_tok).otherwise(F.lit(0.0))
        scores.append(F.struct(ratio.alias("score"), F.lit(lang).alias("lang")))
    # array_max on struct: max by score then lang — invert lang for ties?
    # pin: highest score wins; ties -> lexicographically LAST lang via
    # struct ordering (score asc, lang asc) -> array_max
    best = F.array_max(F.array(*scores))
    return df.select(
        "doc_id",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        F.round(best["score"], 4).alias("lang_score"),
    )


def lang_mix(df: DataFrame, text_col: str = "text", window: int = 20,
             mix_threshold: float = 0.3) -> DataFrame:
    """Mixed-language (code-switching) detection — the signal that drops
    pages whose halves disagree about language (boilerplate in one
    language wrapping content in another, machine-translated splices):
    a monolingual training slice wants documents whose WINDOWS agree
    with the document-level language, not just a confident doc-level
    vote (CCNet/fastText pipelines apply exactly this doc-vs-segment
    agreement check).

    Tokens are cut into fixed ``window``-token windows; each window and
    the whole doc get a language by stopword-HIT argmax (integer
    compares — same decision as :func:`lang_id`'s ratio argmax, since
    the denominator is constant within a scope; ties break to the
    lexicographically LAST language exactly like lang_id, 'und' when
    nothing hits). Output: (doc_id, doc_lang, n_windows, n_agree,
    mix_frac 4dp, is_mixed = mix_frac >= threshold).

    Plan: everything is higher-order functions over the token array —
    no explode, no shuffle; rides the scan at any corpus size."""
    langs = sorted(STOPWORDS.items())

    def _in(arr):
        # PySpark HOF lambdas must take ONLY lambda variables (a default
        # arg would be bound as a second lambda var) — close over `arr`
        return lambda t: F.array_contains(arr, t)

    def _pred(tok_arr):
        scores = [
            F.struct(
                F.size(
                    F.filter(
                        tok_arr,
                        _in(F.array(*[F.lit(w) for w in words])),
                    )
                ).cast("long").alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in langs
        ]
        best = F.array_max(F.array(*scores))
        return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))

    toks = _token_array(F.col(text_col))
    n = F.size(toks)
    n_win = F.when(n > 0, F.floor((n - 1) / window) + 1).otherwise(
        F.lit(0)
    ).cast("long")
    wins = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(1), n_win.cast("int")),
            lambda i: F.slice(toks, (i - 1) * window + 1, window),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    base = df.select(
        "doc_id",
        _pred(toks).alias("doc_lang"),
        n_win.alias("n_windows"),
        F.transform(wins, _pred).alias("win_langs"),
    )
    n_agree = F.size(
        F.filter(F.col("win_langs"), lambda l: l == F.col("doc_lang"))
    ).cast("long")
    mix = F.when(
        F.col("n_windows") > 0,
        F.round(
            F.lit(1.0)
            - n_agree.cast("double") / F.col("n_windows").cast("double"),
            4,
        ),
    ).otherwise(F.lit(0.0))
    return base.select(
        "doc_id",
        "doc_lang",
        "n_windows",
        F.when(F.col("n_windows") > 0, n_agree).otherwise(F.lit(0))
        .cast("long").alias("n_agree"),
        mix.alias("mix_frac"),
        (mix >= mix_threshold).alias("is_mixed"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercased text
    (exact-dup key that survives formatting changes)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), "\\s+", " ")
    return df.select("doc_id", F.md5(norm).alias("fp"))


def exact_dups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via fingerprint groupBy: keep min doc_id as canonical,
    emit (dup_id, canonical_id) for the rest."""
    fp = fingerprint(df, text_col)
    canon = fp.groupBy("fp").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("n")
    )
    return (
        fp.join(canon.filter(F.col("n") > 1), "fp")
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select(F.col("doc_id").alias("dup_id"), "canonical_id")
    )


def shingles(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Word k-gram shingles per doc (distinct)."""
    df = widen_small_scan(df)
    toks = _token_array(F.col(text_col))
    n = F.size(toks)
    # sequence(0, n-k) would DESCEND for n<k; guard with an empty array
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
    )
    return (
        df.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)


def minhash_params(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the universal hash family
    h_i(x) = (a_i*x + b_i) mod p. Knuth multiplicative constant keeps the
    a_i well-spread; a_i != 0 because p is prime and p does not divide
    2654435761."""
    return [
        (((i + 1) * 2654435761) % MINHASH_P, ((i + 1) * 40503) % MINHASH_P)
        for i in range(n_hashes)
    ]


def minhash_signature(df: DataFrame, n_hashes: int = 8,
                      text_col: str = "text", k: int = 3) -> DataFrame:
    """MinHash with ONE hash per shingle: base = the shingle's 60-bit md5
    prefix as an int (mod p), component i = min over shingles of
    (a_i*base + b_i) mod p — the standard universal-hash family (the same
    scheme Spark ML's MinHashLSH uses), so per-shingle hashing cost is
    one md5 instead of n_hashes md5s. p = 2^31-1 keeps a_i*base + b_i
    below 2^62: no int64 overflow under ANSI mode, and the identical
    integer arithmetic is expressible in the DuckDB oracle."""
    sh = shingles(df, text_col, k).withColumn(
        "_base",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10)
            .cast("long"),
            F.lit(MINHASH_P),
        ),
    )
    aggs = [
        F.min(
            F.pmod(F.lit(a) * F.col("_base") + F.lit(b), F.lit(MINHASH_P))
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_params(n_hashes))
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, n_hashes: int = 8, bands: int = 4,
                      text_col: str = "text", k: int = 3,
                      max_bucket: int | None = None) -> DataFrame:
    """MinHash+LSH near-dup candidates: split the signature into bands,
    bucket-join on (band, concatenated band hash) — candidates meet in
    buckets; no cross join anywhere.

    ``max_bucket`` is the hot-bucket scale guard (same contract as
    cosine_neardup_pairs): a band bucket holding > max_bucket docs —
    boilerplate pages whose shingle mins all collide — would go quadratic
    in the within-bucket join, so such buckets are dropped from pair
    generation and the dropped bucket/row counts are LOGGED, never
    silent."""
    rows_per_band = n_hashes // bands
    sig = minhash_signature(df, n_hashes, text_col, k)
    if max_bucket is not None:
        # the guard needs a counting action BEFORE the pair job; cache the
        # signature (one short row per doc) so the corpus-wide shingle+md5
        # aggregation — the dominant cost — runs once, not once per action
        sig = sig.persist()
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("|", *cols).alias("key"))
        )
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    if max_bucket is not None:
        hot_rows = (
            buckets.groupBy("band", "key")
            .count()
            .filter(F.col("count") > max_bucket)
            .collect()  # bounded: only buckets above the cap
        )
        if hot_rows:
            import logging

            logging.getLogger(__name__).warning(
                "minhash_lsh_pairs: dropping %d hot bucket(s) totaling %d "
                "docs (> max_bucket=%d): %s",
                len(hot_rows), sum(r["count"] for r in hot_rows), max_bucket,
                [(r["band"], r["key"], r["count"]) for r in hot_rows[:10]],
            )
            # exclusion from the ALREADY-collected rows: joining against
            # the `hot` plan instead would recompute the full signature
            # aggregation inside the pair job's anti-join
            excl = df.sparkSession.createDataFrame(
                [(r["band"], r["key"]) for r in hot_rows],
                "band int, key string",
            )
            buckets = buckets.join(
                F.broadcast(excl), ["band", "key"], "left_anti",
            )
    a = buckets.select(F.col("doc_id").alias("id_a"), "band", "key")
    b = buckets.select(F.col("doc_id").alias("id_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash16(df: DataFrame, text_col: str = "text") -> DataFrame:
    """16-bit SimHash over tokens: token hash = first 4 hex chars of md5
    (16 bits); each bit contributes +1/-1 weighted by term frequency;
    simhash bit b = 1 iff the sum is > 0. conv() gives the hex→int both
    engines agree on."""
    tok = (
        df.select("doc_id", F.explode(_token_array(F.col(text_col))).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("w"))
        .withColumn("hv", F.conv(F.substring(F.md5(F.col("t")), 1, 4), 16, 10).cast("long"))
    )
    bit_sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("hv"), b).bitwiseAND(1) == 1, F.col("w"))
                .otherwise(-F.col("w"))
            ).alias(f"s{b}")
            for b in range(16)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(16):
        sim = sim + F.when(F.col(f"s{b}") > 0, F.lit(2 ** b)).otherwise(F.lit(0))
    return bit_sums.select("doc_id", sim.alias("simhash"))


def ngram_jaccard_pairs(df: DataFrame, threshold: float = 0.5,
                        text_col: str = "text", k: int = 3,
                        group_col: str | None = "source") -> DataFrame:
    """n-gram Jaccard similarity pairs. The pairwise compare is restricted
    to same-group blocks (blocking key) so the join is an equi-join, not a
    cross product; Jaccard = |∩|/|∪| via shingle-count join."""
    sh = shingles(df, text_col, k)
    if group_col is not None:
        sh = sh.join(df.select("doc_id", group_col), "doc_id")
        join_keys = [group_col, "shingle"]
    else:
        join_keys = ["shingle"]
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(*([group_col] if group_col else []), F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(*([group_col] if group_col else []), F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_int"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a")
                   .withColumnRenamed("n_sh", "sh_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("n_sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_int").cast("double")
                / (F.col("sh_a") + F.col("sh_b") - F.col("n_int")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def winnow_fingerprints(df: DataFrame, k: int = 5, window: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Rolling-hash document fingerprinting via winnowing (Schleimer,
    Wilkerson & Aiken, SIGMOD'03 — the MOSS algorithm): hash every word
    k-gram, slide a window of ``window`` consecutive hashes, keep each
    window's minimum, dedupe. The selected fingerprints are guaranteed
    to overlap for documents sharing any run of >= k+window-1 tokens,
    which makes them a local-similarity key (vs the global md5 of
    ``fingerprint``).

    All native exprs — hashes are the first 8 hex digits of md5 of the
    space-joined k-gram (engine-portable; the DuckDB oracle replays the
    identical math). One explode + distinct; no Python, no self-join.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    n_grams = F.size(toks) - (k - 1)

    def gram_hash(i):
        gram = F.array_join(F.slice(toks, i + 1, k), " ")
        return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")

    grams = F.transform(F.sequence(F.lit(0), n_grams - 1), gram_hash)
    n_windows = n_grams - (window - 1)
    fps = F.transform(
        F.sequence(F.lit(0), n_windows - 1),
        lambda j: F.array_min(F.slice(grams, j + 1, window)),
    )
    out = df.select(
        F.col(id_col),
        F.explode(
            F.when(n_windows > 0, F.array_distinct(fps)).otherwise(
                F.array().cast("array<bigint>")
            )
        ).alias("fingerprint"),
    )
    return out


ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"


def char_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-distribution Shannon entropy per document over the
    [a-z0-9] alphabet — the classic gibberish / encoding-noise /
    key-mash detector in web-text cleaning (very low H = one repeated
    char, binary-as-text; H near the ~5.17-bit uniform max = random
    keyboard mash; prose sits in between). Complements quality_score's
    length/stopword heuristics with a distributional signal.

    Plan (scale-first): counts come from the length-difference trick —
    count(c) = len(t) - len(replace(t, c, '')) — 36 native JVM string
    ops per row, so there is NO per-char explode and NO shuffle at
    all: the operator rides the scan at any corpus size (verified: the
    executed plan has zero Exchange nodes). The 36 terms live in one
    array literal folded with higher-order functions; HOFs evaluate
    interpreted (outside whole-stage codegen) but stay JVM-side — the
    flat 36-way alternative would blow the codegen size cliff into the
    same fallback anyway.

    Determinism: each -p·ln(p) term is pinned to an exact MICRO-NAT
    long (floor(x·1e6 + 0.5)); the per-doc entropy is a sum of longs —
    order-independent exact adds, so the DuckDB oracle matches by
    value hash. Returns (doc_id, n_chars, entropy_micro); docs with no
    alphanumeric chars get (0, 0)."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    counts = F.array(*[
        (F.length(t) - F.length(F.replace(t, F.lit(ch), F.lit(""))))
        .cast("long")
        for ch in ENTROPY_ALPHABET
    ])
    base = df.select(
        "doc_id",
        counts.alias("counts"),
        F.aggregate(
            counts, F.lit(0).cast("long"), lambda a, c: a + c
        ).alias("n_chars"),
    )
    nd = F.col("n_chars").cast("double")
    term = lambda c: F.when(  # noqa: E731 — local expression builder
        (c > 0) & (F.col("n_chars") > 0),
        F.floor(
            (-((c.cast("double") / nd) * F.log(c.cast("double") / nd)))
            * 1e6
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return base.select(
        "doc_id",
        "n_chars",
        F.aggregate(
            F.col("counts"), F.lit(0).cast("long"),
            lambda a, c: a + term(c),
        ).alias("entropy_micro"),
    )


def gopher_quality(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition/composition quality filters (Rae et al.
    2021, "Scaling Language Models: ... Gopher", table A1 — public).

    Per document: word-count/word-shape stats from native expressions,
    and line-repetition stats from one explode + two hash aggregations
    (per-(doc,line) counts, then per-doc rollup — shuffles on doc_id,
    never a self-join). Emits the ratios (4dp) plus a ``keep`` flag.

    Cross-engine determinism: every ``keep`` threshold is evaluated on
    INTEGER sums (e.g. ``10*dup_lines <= 3*n_lines`` instead of
    ``dup_frac <= 0.3``) so float summation order can never flip the
    flag between Spark and the SQL oracle.
    """
    words = F.filter(F.split(F.col(text_col), "\\s+"), lambda w: w != "")
    n_words = F.size(words)
    # total non-whitespace chars == total word length (single pass)
    tot_wlen = F.length(F.regexp_replace(F.col(text_col), "\\s", ""))
    n_alpha = F.size(
        F.filter(words, lambda w: F.length(F.regexp_replace(w, "[^a-zA-Z]", "")) > 0)
    )
    n_hash = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    )
    n_ell = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), "\\.\\.\\.", ""))
    ) / 3
    word_stats = df.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        tot_wlen.cast("long").alias("tot_wlen"),
        n_alpha.cast("long").alias("n_alpha"),
        (n_hash + n_ell.cast("long")).cast("long").alias("n_sym"),
    )

    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    per_line = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(lines).alias("line"))
        .groupBy("doc_id", "line")
        .agg(F.count(F.lit(1)).alias("cnt"), F.length(F.col("line")).alias("llen"))
    )
    line_stats = per_line.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_lines"),
        F.sum(F.col("cnt") - 1).cast("long").alias("n_dup_lines"),
        F.sum((F.col("cnt") - 1) * F.col("llen")).cast("long").alias("dup_chars"),
        F.sum(F.col("cnt") * F.col("llen")).cast("long").alias("tot_chars"),
        F.sum(
            F.when(
                F.col("line").startswith("-")
                | F.col("line").startswith("*")
                | F.col("line").startswith("•"),
                F.col("cnt"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("n_bullet"),
        F.sum(
            F.when(F.col("line").endswith("..."), F.col("cnt")).otherwise(F.lit(0))
        ).cast("long").alias("n_ell_lines"),
    )

    j = word_stats.join(line_stats, "doc_id", "left").na.fill(
        {c: 0 for c in ["n_lines", "n_dup_lines", "dup_chars", "tot_chars",
                        "n_bullet", "n_ell_lines"]}
    )
    nl = F.col("n_lines")
    keep = (
        (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
        & (3 * F.col("n_words") <= F.col("tot_wlen"))
        & (F.col("tot_wlen") <= 10 * F.col("n_words"))
        & (5 * F.col("n_alpha") >= 4 * F.col("n_words"))
        & (10 * F.col("n_sym") <= F.col("n_words"))
        & (10 * F.col("n_bullet") <= 9 * nl)
        & (10 * F.col("n_ell_lines") <= 3 * nl)
        & (10 * F.col("n_dup_lines") <= 3 * nl)
        & (5 * F.col("dup_chars") <= F.col("tot_chars"))
    )

    def _frac(num, den):
        return F.round(
            F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 4
        )

    return j.select(
        "doc_id",
        "n_words",
        "n_lines",
        _frac(F.col("n_dup_lines"), nl).alias("dup_line_frac"),
        _frac(F.col("dup_chars"), F.col("tot_chars")).alias("dup_char_frac"),
        _frac(F.col("n_bullet"), nl).alias("bullet_frac"),
        _frac(F.col("n_ell_lines"), nl).alias("ellipsis_frac"),
        _frac(F.col("n_sym"), F.col("n_words")).alias("symbol_ratio"),
        keep.alias("keep"),
    )


def paragraph_dedup(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", sep: str = "\n") -> DataFrame:
    """Paragraph/line-level exact dedup across the whole corpus
    (RefinedWeb/C4-style, public): split each document on ``sep``, keep
    only the globally FIRST occurrence of each distinct trimmed
    paragraph (first = smallest (doc_id, position)), and reassemble the
    surviving text per document.

    Plan: posexplode → one window over md5(paragraph) (partitions are
    per-distinct-paragraph — tiny, skew-free) → groupBy(doc_id) rebuild.
    Returns (doc_id, n_paras, n_kept, dedup_text).
    """
    paras = F.filter(
        F.transform(F.split(F.col(text_col), sep), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    exploded = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(paras).alias("pos", "para")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col("para"))).orderBy("doc_id", "pos")
    flagged = exploded.withColumn(
        "kept", F.row_number().over(w) == 1
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum(F.col("kept").cast("long")).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("kept"), F.struct("pos", "para")).otherwise(
                            F.lit(None)
                        )
                    )
                ),
                lambda s: s["para"],
            ),
            sep,
        ).alias("dedup_text"),
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame, k: int = 3,
                  text_col: str = "text",
                  broadcast_benchmark: bool = True) -> DataFrame:
    """Training-set decontamination (GPT-3 appendix C style, public):
    flag every training document that shares at least one word ``k``-gram
    with an eval/benchmark text, so eval answers can be anti-joined out
    of the training corpus before a run.

    Plan: shingle both sides with the same tokenizer as the dedup family,
    reduce each shingle to its 60-bit md5-prefix integer (one md5 per
    shingle — same trick as MinHash; shrinks the join key from a string
    to a long), semi-join docs→benchmark on that hash, count distinct
    matching shingles per doc.

    Scale: the benchmark side is eval sets — thousands of rows, MBs — so
    its distinct gram hashes BROADCAST and the 100-TB docs side streams
    through an unshuffled BroadcastHashJoin + partial-aggregated groupBy
    on doc_id. Set ``broadcast_benchmark=False`` for an oversized
    benchmark side and the same plan becomes a hash-partitioned equi-join
    on the gram hash (still never all-pairs).

    Returns (doc_id, n_hits, contaminated) for EVERY input doc —
    n_hits = number of distinct shared k-grams (shingles() dedups
    per-doc), contaminated = n_hits > 0.
    """
    gh = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")
    dsh = shingles(docs, text_col, k).select("doc_id", gh.alias("gh"))
    bsh = (
        shingles(
            benchmark.select(
                F.monotonically_increasing_id().alias("doc_id"),
                F.col(text_col),
            ),
            text_col,
            k,
        )
        .select(gh.alias("gh"))
        .distinct()
    )
    if broadcast_benchmark:
        bsh = F.broadcast(bsh)
    hits = dsh.join(bsh, "gh").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def domain_quality_rollup(df: DataFrame, domain_col: str = "source",
                          text_col: str = "text",
                          min_quality: float = 0.5) -> DataFrame:
    """Domain-level quality gate (the C4/RefinedWeb move of judging a
    SITE, not a page): roll the per-doc ``quality_score`` up per domain
    and keep a domain when at least half its docs clear ``min_quality``.

    The keep rule compares INTEGERS (2*n_good >= n_docs) so float
    summation order can't flip it cross-engine; avg_quality is reported
    at 4dp for humans. One shuffle (groupBy domain); domains are
    heavy-hitter-skewed at 100 TB but the aggregation is partial
    (map-side combine), so a hot domain costs one reducer one long row
    stream, not memory.

    Returns (domain, n_docs, n_good, avg_quality, domain_keep).
    """
    q = quality_score(df, text_col)
    joined = df.select("doc_id", F.col(domain_col).alias("domain")).join(q, "doc_id")
    return (
        joined.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("quality") >= min_quality).cast("long"))
            .cast("long").alias("n_good"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .withColumn("domain_keep", 2 * F.col("n_good") >= F.col("n_docs"))
    )


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround, unambiguous quantifiers
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d[\d ()-]{7,14}\d"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / international-format phone numbers with
    typed placeholder tokens (the standard pre-training privacy pass).

    All native regexp expressions — JVM-side, whole-stage codegen, zero
    shuffle; order matters (emails first, so an address is never half
    eaten by the phone pattern; IPv4 before phone, so a dotted quad is
    not mistaken for digits-and-punctuation).

    Returns (doc_id, scrubbed, n_emails, n_ips, n_phones).
    """
    t0 = F.col(text_col)
    n_emails = F.regexp_count(t0, F.lit(PII_EMAIL))
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    n_ips = F.regexp_count(t1, F.lit(PII_IPV4))
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    n_phones = F.regexp_count(t2, F.lit(PII_PHONE))
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return df.select(
        "doc_id",
        t3.alias("scrubbed"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
    )


def boilerplate_strip(df: DataFrame, domain_col: str = "source",
                      text_col: str = "text", max_df: float = 0.5,
                      min_docs: int = 2) -> DataFrame:
    """Domain-level boilerplate removal (CCNet/RefinedWeb-style): a line
    is boilerplate within a domain when it appears in MORE than
    ``max_df`` of that domain's documents (and the domain has at least
    ``min_docs`` docs — a one-page domain has no frequency signal).
    Nav bars, cookie banners and footers hit every page of a site; real
    content doesn't.

    Plan: posexplode trimmed lines → per-(domain, line) distinct-doc
    count (two hash aggs, partial/map-side combined) → integer-compare
    gate (count * 1/max_df > n_docs avoids float df ratios) → anti-join
    lines on (domain, line) → reassemble per doc in original order.
    Shuffles on (domain, line) — fine-grained keys, skew-free; never a
    per-domain single partition.

    Returns (doc_id, n_lines, n_kept, clean_text).
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    ex = df.select(
        "doc_id",
        F.col(domain_col).alias("domain"),
        F.posexplode(lines).alias("pos", "line"),
    )
    domain_docs = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    line_df = (
        ex.select("domain", "line", "doc_id").distinct()
        .groupBy("domain", "line")
        .agg(F.count(F.lit(1)).cast("long").alias("df_count"))
    )
    # integer gate: df_count/n_docs > max_df  ⇔  df_count * k > n_docs * j
    # with max_df = j/k rational; use scaled-by-1e6 longs for generality
    scale = 1_000_000
    boiler = (
        line_df.join(domain_docs, "domain")
        .filter(
            (F.col("df_count") * scale > F.col("n_docs") * int(max_df * scale))
            & (F.col("n_docs") >= min_docs)
        )
        .select("domain", "line")
    )
    kept = ex.join(boiler, ["domain", "line"], "left_anti")
    stats = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    return (
        df.select("doc_id")
        .join(stats, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def unigram_logprob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet-style fluency signal without a model download: score each
    document by the mean negative log-probability of its tokens under
    the CORPUS's own unigram distribution. Gibberish and rare-token spam
    score high (bad); common fluent text scores low.

    Two hash aggregations (corpus unigram counts, then per-doc mean over
    the token→count join); the unigram table is vocabulary-sized —
    broadcastable at any corpus size that fits a language (word vocab
    grows ~ O(corpus^0.5), Heaps' law).

    Returns (doc_id, n_tokens, nll) with nll = round(avg(-ln(c/N)), 4),
    null for empty docs.
    """
    toks = df.select(
        "doc_id", F.explode(_token_array(F.col(text_col))).alias("tok")
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    total = uni.agg(F.sum("c")).first()[0] or 1
    scored = toks.join(F.broadcast(uni), "tok").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(
            F.avg(-F.log(F.col("c").cast("double") / float(total))), 4
        ).alias("nll"),
    )
    return (
        df.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.col("nll"),
        )
    )


def gopher_repetition(df: DataFrame, text_col: str = "text",
                      top_ns: tuple[int, ...] = (2, 3, 4),
                      dup_ns: tuple[int, ...] = (5, 10)) -> DataFrame:
    """The n-gram half of Gopher's repetition filters (Rae et al. 2021
    table A1, public): per document, the fraction of characters taken by
    the single most frequent word n-gram (n in ``top_ns``) and by all
    n-grams occurring more than once (n in ``dup_ns``).

    Occurrences are POSITIONAL (not deduped — a gram occurring 5 times
    contributes 5×); a gram's character weight is the total length of
    its words (separators excluded), and the denominator is the doc's
    total word-character count — the common convention in public Gopher
    replications (overlap regions are summed, not unioned).

    Plan: ONE explode over all requested n values (grams tagged by n) →
    one (doc, n, gram) hash agg → one per-(doc, n) rollup → pivot to
    columns via conditional aggregation. Two shuffles total regardless
    of how many n values are requested.

    ``keep`` uses Gopher's thresholds (top2 ≤ .20, top3 ≤ .18,
    top4 ≤ .16, dup5 ≤ .15, dup10 ≤ .10) as INTEGER char-count compares
    so float order can't flip the flag cross-engine. Fractions reported
    at 4dp.
    """
    arr = _token_array(F.col(text_col))
    tot = F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    all_ns = sorted(set(top_ns) | set(dup_ns))

    def grams_for(n: int):
        idx = F.when(F.size(arr) >= n, F.sequence(F.lit(0), F.size(arr) - n)
                     ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.array_join(F.slice(arr, i + 1, n), " ").alias("gram"),
            ),
        )

    base = df.select("doc_id", tot.alias("tot_wchars"),
                     F.concat(*[grams_for(n) for n in all_ns]).alias("gs"))
    per_gram = (
        base.select("doc_id", "tot_wchars", F.explode("gs").alias("g"))
        .groupBy("doc_id", "tot_wchars", F.col("g.n").alias("n"),
                 F.col("g.gram").alias("gram"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # word chars of one occurrence = gram length minus the n-1 spaces
        .withColumn("glen", F.length("gram") - (F.col("n") - 1))
    )
    per_n = per_gram.groupBy("doc_id", "tot_wchars", "n").agg(
        F.max(F.col("cnt") * F.col("glen")).cast("long").alias("top_chars"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.col("glen"))
            .otherwise(F.lit(0))
        ).cast("long").alias("dup_chars"),
    )

    def pick(n: int, col: str):
        return F.coalesce(
            F.max(F.when(F.col("n") == n, F.col(col))), F.lit(0)
        ).cast("long")

    def frac(chars):
        return F.round(
            F.when(F.col("tot_wchars") > 0,
                   chars.cast("double") / F.col("tot_wchars"))
            .otherwise(F.lit(0.0)), 4)

    # Gopher thresholds as integer j/k rationals: .20=1/5 .18=9/50
    # .16=4/25 .15=3/20 .10=1/10
    thresholds = {("top", 2): (1, 5), ("top", 3): (9, 50),
                  ("top", 4): (4, 25), ("dup", 5): (3, 20),
                  ("dup", 10): (1, 10)}
    rolled = per_n.groupBy("doc_id", "tot_wchars").agg(
        *[pick(n, "top_chars").alias(f"top{n}_chars") for n in top_ns],
        *[pick(n, "dup_chars").alias(f"dup{n}_chars") for n in dup_ns],
    )
    keep = F.lit(True)
    for n in top_ns:
        j, k = thresholds[("top", n)]
        keep = keep & (k * F.col(f"top{n}_chars") <= j * F.col("tot_wchars"))
    for n in dup_ns:
        j, k = thresholds[("dup", n)]
        keep = keep & (k * F.col(f"dup{n}_chars") <= j * F.col("tot_wchars"))
    out = (
        df.select("doc_id")
        .join(rolled, "doc_id", "left")
        .na.fill(0)
        .select(
            "doc_id",
            F.col("tot_wchars").cast("long").alias("tot_wchars"),
            *[frac(F.col(f"top{n}_chars")).alias(f"top{n}_frac")
              for n in top_ns],
            *[frac(F.col(f"dup{n}_chars")).alias(f"dup{n}_frac")
              for n in dup_ns],
            keep.alias("keep"),
        )
    )
    return out


# C4's line-drop phrase list (Raffel et al. 2020 §2.2, public): lines
# mentioning javascript or boilerplate cookie/policy notices are removed
# before the page-level rules run.
C4_POLICY_PHRASES = (
    "javascript",
    "cookie policy",
    "privacy policy",
    "terms of use",
    "uses cookies",
)


def c4_line_filters(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_words: int = 5,
                    min_sentences: int = 3) -> DataFrame:
    """C4-style line + page filters (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning with a Unified Text-to-Text
    Transformer" §2.2 — public).

    Line rules (a line survives iff ALL hold):
      * ends with terminal punctuation (``. ! ? "``);
      * has at least ``min_words`` whitespace words;
      * does not contain (case-insensitive) any ``C4_POLICY_PHRASES``
        entry ("javascript", cookie/policy boilerplate).

    Page rules: drop the page if it contains "lorem ipsum" (any case),
    a ``{`` (code), or fewer than ``min_sentences`` surviving lines.

    Entirely native expressions over the line array — zero shuffle,
    zero Python; at 100 TB this is a map-only pass that rides the
    parquet scan. ``clean_hash`` is md5 of the surviving lines joined
    by newline, so the oracle compares the reassembled text exactly
    without hauling long strings through the hash gate.
    """
    col = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(col, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )

    def _line_ok(x):
        words = F.filter(F.split(x, "\\s+"), lambda w: w != "")
        ok = x.rlike('[.!?"]$') & (F.size(words) >= min_words)
        low = F.lower(x)
        for p in C4_POLICY_PHRASES:
            ok = ok & ~low.contains(p)
        return ok

    kept = F.filter(lines, _line_ok)
    n_lines = F.size(lines).cast("long")
    n_kept = F.size(kept).cast("long")
    has_lorem = F.lower(col).contains("lorem ipsum")
    has_brace = col.contains("{")
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept"),
        F.round(
            F.when(n_lines > 0, n_kept.cast("double") / n_lines)
            .otherwise(F.lit(0.0)), 4
        ).alias("kept_frac"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (~has_lorem & ~has_brace & (n_kept >= min_sentences)).alias("keep"),
        F.md5(F.array_join(kept, "\n")).alias("clean_hash"),
    )


def ccnet_buckets(df: DataFrame, text_col: str = "text",
                  lang_col: str = "lang") -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020, "CCNet: Extracting High Quality Monolingual Datasets from
    Web Crawl Data" — public): score each document with the corpus
    unigram NLL (:func:`unigram_logprob`, the model-free stand-in for
    the KenLM perplexity) and split EACH LANGUAGE into equal thirds —
    head (most fluent) / middle / tail — via ``ntile(3)`` ordered by
    (nll, doc_id).

    One window shuffle keyed on language; the NLL itself is two hash
    aggregations with a broadcast vocabulary join. Per-language ntile
    is exactly CCNet's design (buckets are defined within a language,
    never across), and the (nll, doc_id) order pins ties cross-engine.
    """
    from pyspark.sql import Window

    scored = unigram_logprob(df, text_col)
    joined = df.select("doc_id", F.col(lang_col).alias("lang")).join(
        scored, "doc_id"
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("nll").asc_nulls_last(), F.col("doc_id")
    )
    tert = F.ntile(3).over(w)
    return joined.select(
        "doc_id",
        "lang",
        "nll",
        F.when(tert == 1, F.lit("head"))
        .when(tert == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# GPT-2-family pretokenizer shape without the RE2-incompatible lookahead
# (`\s+(?!\S)`) so the same pattern runs verbatim in Spark (Java regex)
# and the DuckDB oracle (RE2): an optional leading space glued to a
# letter-run or digit-run or punctuation-run, else a whitespace run.
BPE_SPLIT_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n]+|[ \t\n]+"


def bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-pretokenizer-style token counting (the regex half of the
    GPT-2/tiktoken pipeline — Radford et al. 2019, public; the merges
    table needs a model download this environment doesn't have, so the
    count is over pretokenizer pieces, the exact upper bound BPE merges
    start from).

    Counts whole-pattern matches of :data:`BPE_SPLIT_PATTERN` — native
    ``regexp_extract_all`` inside codegen, zero shuffle, rides the scan.
    Complements :func:`token_count` (whitespace+punct tokenizer): that
    one prices words, this one prices sub-word pieces.
    """
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_PATTERN), 0)
    return df.select(
        "doc_id",
        F.coalesce(F.size(pieces), F.lit(0)).cast("long").alias("n_pieces"),
        # whitespace runs are glue, not billable tokens: count the
        # pieces whose first char is not whitespace (the " ?x" forms)
        F.coalesce(
            F.size(F.filter(pieces, lambda p: ~p.rlike("^[ \t\n]+$"))),
            F.lit(0),
        ).cast("long").alias("n_tokens"),
    )


def tokenizer_fertility(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenizer fertility — subword pieces per whitespace word, the
    standard "how tokenizer-unfriendly is this text" signal (high
    fertility = digit soup, mashed punctuation, non-target scripts —
    text that explodes into many pieces per word and wastes training
    context). Composes the two counting conventions already proven
    here: pieces = :data:`BPE_SPLIT_PATTERN` non-whitespace matches
    (bpe_token_count's billable pieces), words = the [a-z0-9]
    whitespace tokenizer (:func:`token_count`).

    fertility_milli = (n_pieces·1000) // n_words — exact integer
    division, no floats anywhere, so the DuckDB oracle matches by
    value. Zero-word docs report 0. Pure per-row exprs: no shuffle,
    rides the scan."""
    pieces = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(BPE_SPLIT_PATTERN), 0
    )
    n_pieces = F.coalesce(
        F.size(F.filter(pieces, lambda p: ~p.rlike("^[ \t\n]+$"))), F.lit(0)
    ).cast("long")
    n_words = F.size(_token_array(F.col(text_col))).cast("long")
    n_words = F.when(n_words > 0, n_words).otherwise(F.lit(0)).cast("long")
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        n_pieces.alias("n_pieces"),
        F.when(
            n_words > 0,
            # floor of an exact double ratio == BIGINT // for positives
            # (numerator < 2^53 by construction)
            F.floor((n_pieces * 1000).cast("double") / n_words),
        ).otherwise(F.lit(0)).cast("long").alias("fertility_milli"),
    )


def dup_spans(df: DataFrame, k: int = 8, text_col: str = "text",
              flag_frac: float = 0.5) -> DataFrame:
    """Cross-document duplicated-substring mass (the metric behind exact
    substring deduplication — Lee et al., "Deduplicating Training Data
    Makes Language Models Better", ACL'22, which builds a suffix array
    to find ≥50-token repeats; a distributed engine gets the same
    signal from word k-gram doc frequency: a position is inside a
    duplicated span iff its k-gram occurs in at least one OTHER
    document).

    Per doc: ``n_grams`` (token k-gram positions), ``n_dup_grams``
    (positions whose gram also appears in another doc), ``dup_frac``
    (4dp), ``dup_flag`` (dup_frac ≥ ``flag_frac`` — candidates for
    dropping or span-trimming). Docs shorter than ``k`` tokens have
    zero grams and never flag. Within-doc repetition is deliberately
    NOT counted (that is gopher_repetition's job) — a gram repeated 10×
    in one doc only counts when some other doc has it too.

    Plan: grams reduce to 60-bit md5-prefix ints immediately (no string
    shuffles); per-(doc, gram) counts first (map-side combine eats
    boilerplate repeats), then gram doc-frequency is a count over that
    table (rows are per-doc distinct already — no expensive
    count_distinct), then one equi-join on the gram hash and a final
    per-doc rollup. Two hash aggs + one shuffle join + one hash agg —
    no windows, no broadcasts of unbounded tables, no driver
    materialization. At 100 TB the (doc, gram) table is ~tokens-sized;
    bump ``k`` to shrink it (longer grams → fewer, rarer matches) and
    bucket both sides of the join on ``gh`` to co-locate.
    """
    df = widen_small_scan(df)
    toks = _token_array(F.col(text_col))
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k),
                                                    " "))
    gh = F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10).cast("long")
    inst = (
        df.select("doc_id", F.explode_outer(grams).alias("gram"))
        .select("doc_id", F.when(F.col("gram").isNotNull(), gh).alias("gh"))
    )
    per_doc_gram = inst.groupBy("doc_id", "gh").agg(
        F.count(F.lit(1)).alias("c")
    )
    gram_df = per_doc_gram.filter(F.col("gh").isNotNull()).groupBy("gh").agg(
        F.count(F.lit(1)).alias("nd")
    )
    joined = per_doc_gram.join(gram_df, "gh", "left")
    n_grams = F.sum(F.when(F.col("gh").isNotNull(), F.col("c"))
                    .otherwise(F.lit(0)))
    n_dup = F.sum(F.when(F.col("nd") >= 2, F.col("c")).otherwise(F.lit(0)))
    return joined.groupBy("doc_id").agg(
        n_grams.cast("long").alias("n_grams"),
        n_dup.cast("long").alias("n_dup_grams"),
    ).select(
        "doc_id", "n_grams", "n_dup_grams",
        F.round(
            F.when(F.col("n_grams") > 0,
                   F.col("n_dup_grams") / F.col("n_grams"))
            .otherwise(F.lit(0.0)), 4
        ).alias("dup_frac"),
        (
            (F.col("n_grams") > 0)
            & (F.col("n_dup_grams") / F.col("n_grams") >= flag_frac)
        ).alias("dup_flag"),
    )


def dedup_spans_remove(df: DataFrame, k: int = 8,
                       text_col: str = "text") -> DataFrame:
    """Exact-substring dedup REMOVAL — the acting stage behind the
    ``dup_spans`` metric (Lee et al., ACL'22: all but one occurrence of
    a duplicated span is deleted from the corpus; their suffix array
    becomes a distributed k-gram doc-frequency join here).

    Rule (deterministic, engine-independent): a token k-gram is a
    duplicated span iff it occurs in ≥ 2 documents; every holder EXCEPT
    the minimum-doc_id owner deletes the tokens its duplicated spans
    cover. The owner keeps its copy, so every span survives exactly
    once corpus-wide (the paper's semantics; within-doc repeats are
    gopher_repetition's job).

    Returns one row per input doc, scalar surface only:
    (doc_id, n_tokens, n_removed, kept_frac 4dp, clean_hash =
    md5 of the space-joined surviving tokens — md5('') when everything
    was covered).

    Plan: token- and gram-position explodes (both ~token-count rows,
    int payloads), the same per-doc-distinct → doc-frequency aggs as
    ``dup_spans`` (map-side combine eats boilerplate), one equi-join
    back on the gram hash, interval cover via an explode(sequence) +
    distinct + anti-join (linear in covered tokens — NO per-doc
    quadratic membership scans, no windows), and a final
    sort-struct-collect per doc to reassemble the cleaned text. At
    100 TB: everything shuffles on doc_id or gh; bucket both sides of
    the gh join to co-locate, and bump k to shrink the gram table.
    """
    toks = _token_array(F.col(text_col))
    base = df.select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    pos = base.select(
        "doc_id", F.posexplode_outer("toks").alias("p", "tok")
    ).filter(F.col("tok").isNotNull())
    gstruct = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.struct(
                i.alias("i"),
                F.array_join(F.slice("toks", i + 1, k), " ").alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<i:int,gram:string>>"))
    gh = F.conv(
        F.substring(F.md5(F.col("g.gram")), 1, 15), 16, 10
    ).cast("long")
    starts = base.select("doc_id", F.explode(gstruct).alias("g")).select(
        "doc_id", F.col("g.i").alias("i"), gh.alias("gh")
    )
    st = (
        starts.select("doc_id", "gh")
        .distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("nd"), F.min("doc_id").alias("owner"))
    )
    ds = (
        starts.join(st, "gh")
        .filter((F.col("nd") >= 2) & (F.col("doc_id") != F.col("owner")))
        .select("doc_id", "i")
    )
    cov = ds.select(
        "doc_id",
        F.explode(F.sequence(F.col("i"), F.col("i") + (k - 1))).alias("p"),
    ).distinct()
    kept = pos.join(cov, ["doc_id", "p"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            )
        ).alias("clean_hash"),
    )
    nk = F.coalesce(F.col("n_kept"), F.lit(0))
    return (
        base.select("doc_id", n.alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - nk).cast("long").alias("n_removed"),
            F.round(
                F.when(F.col("n_tokens") > 0, nk / F.col("n_tokens"))
                .otherwise(F.lit(1.0)),
                4,
            ).alias("kept_frac"),
            F.coalesce(F.col("clean_hash"), F.md5(F.lit(""))).alias(
                "clean_hash"
            ),
        )
    )


def hashed_linear_score(df: DataFrame, n_features: int = 1024,
                        text_col: str = "text") -> DataFrame:
    """Hashed bag-of-words linear classifier SCORING — the serving plan
    of the fastText-style quality filters used to curate web corpora
    (GPT-3's LR-over-CommonCrawl filter; the hashing trick of
    Weinberger et al., ICML'09): tokens hash to ``n_features`` feature
    ids, a (feature, weight) table joins in by BROADCAST, and one hash
    aggregation emits the per-doc mean weight as the score.

    Weights are a deterministic synthetic stand-in for a trained
    artifact (no model downloads in this env):
    ``w(f) = ((md5int('w'||f) mod 2001) - 1000) / 1000 ∈ [-1, 1]``.
    Swap the generated frame for a real coefficient table and the plan
    is unchanged — that is the point: at 100 TB the corpus side only
    explodes tokens and never shuffles; the weight table (KBs–MBs) is
    the broadcast side; the only shuffle is the final groupBy(doc_id),
    which map-side combines.

    Returns (doc_id, n_tokens, score 4dp, label = score ≥ 0).
    """
    spark = df.sparkSession
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("w"), F.col("id").cast("string"))),
                    1, 15), 16, 10
    ).cast("long")
    # integer milli-weights: the per-doc accumulation stays in int64 so
    # the score is independent of addition order (float sums are not —
    # the same discipline as the TPC-H integer-cent revenue queries)
    weights = spark.range(n_features).select(
        F.col("id").cast("int").alias("fid"),
        (F.pmod(h, F.lit(2001)) - 1000).cast("long").alias("wt_milli"),
    )
    fid = F.pmod(
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long"),
        F.lit(n_features),
    ).cast("int")
    feats = (
        df.select("doc_id", F.explode(_token_array(F.col(text_col)))
                  .alias("tok"))
        .select("doc_id", fid.alias("fid"))
        .join(F.broadcast(weights), "fid")
    )
    agg = feats.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        (F.round(
            F.sum("wt_milli").cast("double")
            / (F.count(F.lit(1)) * 1000.0), 4
        ) + F.lit(0.0)).alias("score"),
    )
    return (
        df.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long"))
            .alias("n_tokens"),
            F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
            (F.coalesce(F.col("score"), F.lit(0.0)) >= 0).alias("label"),
        )
    )


def containment_pairs(df: DataFrame, threshold: float = 0.8,
                      text_col: str = "text", k: int = 3,
                      group_col: str | None = "source") -> DataFrame:
    """DIRECTED near-duplicate containment (Broder's resemblance-vs-
    containment distinction, and the signal behind quote/subset dedup
    in training pipelines): C(A→B) = |shingles(A) ∩ shingles(B)| /
    |shingles(A)|. A truncated copy, a quoted excerpt, or a page
    embedded in a boilerplate wrapper scores ~1.0 here while its
    symmetric Jaccard can sit far below any dedup threshold — so a
    Jaccard-only sweep KEEPS the subset duplicate.

    Same blocked shingle equi-join as ngram_jaccard_pairs (never a
    cross product); emits both directions of a pair when both clear
    the threshold. Returns (id_sub, id_super, containment 4dp)."""
    sh = shingles(df, text_col, k)
    if group_col is not None:
        sh = sh.join(df.select("doc_id", group_col), "doc_id")
        join_keys = [group_col, "shingle"]
    else:
        join_keys = ["shingle"]
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(*([group_col] if group_col else []),
                  F.col("doc_id").alias("id_sub"), "shingle")
    b = sh.select(*([group_col] if group_col else []),
                  F.col("doc_id").alias("id_super"), "shingle")
    inter = (
        a.join(b, join_keys)
        .filter(F.col("id_sub") != F.col("id_super"))
        .groupBy("id_sub", "id_super")
        .agg(F.count("*").alias("n_int"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "id_sub")
            .withColumnRenamed("n_sh", "sh_sub"), "id_sub")
        .withColumn(
            "containment",
            F.round(F.col("n_int").cast("double") / F.col("sh_sub"), 4),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_sub", "id_super", "containment")
    )


def collocations(df: DataFrame, min_count: int = 30,
                 text_col: str = "text") -> DataFrame:
    """Corpus collocations by pointwise mutual information — the classic
    "which word pairs belong together" signal (Church & Hanks 1990)
    used for phrase mining over web text. PMI(x,y) = ln(n_xy · N /
    (n_x · n_y)) over ADJACENT token pairs (occurrences, not distinct).

    All counts are exact longs from two hash aggs (bigrams, unigrams);
    N = total bigram occurrences. The single ln runs on an exact
    integer ratio's double on both engines; output rounded 4dp and the
    row set is cut by the exact ``min_count`` filter, so membership
    never depends on the float. Returns (w1, w2, n_pair, pmi)."""
    df = widen_small_scan(df)
    toks = _token_array(F.col(text_col))
    n = F.size(toks)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = df.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    uni = (
        pairs.select(F.col("w1").alias("w"))
        .unionAll(pairs.select("w2"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    )
    tot = bi.agg(F.sum("n_pair").alias("n_total"))
    scored = (
        bi.filter(F.col("n_pair") >= min_count)
        .join(F.broadcast(tot))
        .join(uni.select(F.col("w").alias("w1"),
                         F.col("n_w").alias("n_1")), "w1")
        .join(uni.select(F.col("w").alias("w2"),
                         F.col("n_w").alias("n_2")), "w2")
    )
    # slot-count PMI variant: unigram counts are bigram-slot counts, so
    # p(x) = n_x/2N and the 2·2/1 normalizers fold into a constant that
    # shifts every score equally — we pin the constant-free form
    # ln(n_pair · N / (n_1 · n_2)) as THE definition (documented here;
    # the oracle replays the identical expression tree)
    pmi = F.log(
        (F.col("n_pair").cast("double") * F.col("n_total"))
        / (F.col("n_1").cast("double") * F.col("n_2"))
    )
    return scored.select(
        "w1", "w2", F.col("n_pair").cast("long").alias("n_pair"),
        F.round(pmi, 4).alias("pmi"),
    )


def bigram_logprob(df: DataFrame, train: DataFrame | None = None,
                   text_col: str = "text",
                   backoff: float = 0.4) -> DataFrame:
    """Bigram LM fluency with stupid backoff (Brants et al. 2007, the
    public web-scale LM recipe) — the next rung above unigram_logprob:
    score every document by the mean -ln P(w2|w1) of its adjacent token
    pairs under counts from ``train`` (defaults to the corpus itself;
    pass a held-out/filtered frame so unseen-bigram backoff is real).

      P(w2|w1) = c(w1,w2)/c(w1·)              if the bigram was seen
               = backoff · c(·w2)/N_pairs     elif w2 was seen 2nd-slot
               = backoff / N_pairs            otherwise

    Determinism: every count is an exact long; each pair's nll becomes
    an exact MICRO-NAT long (floor(-ln(p)·1e6 + 0.5) — the tfidf
    micro-rounding trick), per-doc sums are exact long adds, and the
    mean divides two exact ints. The count tables are vocabulary-sized
    (broadcastable); scoring is two broadcast joins over the doc-pair
    frame. Returns (doc_id, n_pairs, nll 4dp — null when < 2 tokens).
    """
    tr = train if train is not None else df

    def _pairs(frame):
        frame = widen_small_scan(frame)
        toks = _token_array(F.col(text_col))
        n = F.size(toks)
        idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
            F.array().cast("array<int>")
        )
        return frame.select(
            "doc_id",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("w1"),
                        F.element_at(toks, i + 1).alias("w2"),
                    ),
                )
            ).alias("p"),
        ).select("doc_id", "p.w1", "p.w2")

    # One pass over the training pair explode: the bigram table is the
    # only aggregate that needs the raw pairs; c(w1·), c(·w2) and
    # N_pairs are all marginals of c(w1,w2), so they derive from the
    # (vocabulary-sized, materialized-once) bigram table instead of
    # re-executing the full explode three more times. localCheckpoint
    # cuts the lineage so the four consumers below read the cached
    # blocks, never the corpus.
    tp = _pairs(tr)
    big = (
        tp.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=True)
    )
    ctx = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    second = big.groupBy("w2").agg(F.sum("c12").alias("c2"))
    n_pairs = (big.agg(F.sum("c12")).collect()[0][0] or 0) or 1

    sp = (
        _pairs(df)
        .join(F.broadcast(big), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .join(F.broadcast(second), "w2", "left")
    )
    p = (
        F.when(
            F.col("c12").isNotNull(),
            F.col("c12").cast("double") / F.col("c1"),
        )
        .when(
            F.col("c2").isNotNull(),
            F.lit(backoff) * F.col("c2") / F.lit(float(n_pairs)),
        )
        .otherwise(F.lit(backoff) / F.lit(float(n_pairs)))
    )
    nll_micro = F.floor(-F.log(p) * 1e6 + 0.5).cast("long")
    scored = sp.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(
            F.sum(nll_micro).cast("double") / F.count(F.lit(1)) / 1e6, 4
        ).alias("nll"),
    )
    return (
        df.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.col("nll"),
        )
    )


def chi2_terms(df: DataFrame, k: int = 5, text_col: str = "text",
               group_col: str = "source") -> DataFrame:
    """Per-group DISTINCTIVE terms by chi-squared (the classic feature-
    selection statistic; Manning/Schütze ch. 5): for term t in group s,
    the 2×2 contingency of (occurrences of t in s / elsewhere) vs
    (other tokens in s / elsewhere), χ² = N(ad−bc)²/((a+b)(c+d)(a+c)
    (b+d)). Where tf·idf asks "what is this DOC about", χ² asks "what
    makes this GROUP different from the rest of the corpus".

    All contingency cells come from two exact hash aggs; χ² is computed
    double-side with one fixed expression tree (the (ad−bc)² term can
    exceed int64, so the casts happen at documented points the oracle
    replays), then pinned to an exact MILLI long for ranking — top-k
    per group by (χ²_milli desc, term asc) is engine-deterministic.
    Returns (group, term, a = in-group count, chi2 4dp-from-milli,
    rnk)."""
    # Single pass over the token explode: group totals, term totals and
    # the corpus total are all marginals of the (grp, term) contingency
    # table, so only a_tab ever reads the exploded tokens; it is
    # materialized once (localCheckpoint) and the other three derive
    # from its cached blocks instead of re-running the explode.
    toks = widen_small_scan(df).select(
        F.col(group_col).alias("grp"),
        F.explode(_token_array(F.col(text_col))).alias("term"),
    )
    a_tab = (
        toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("a"))
        .localCheckpoint(eager=True)
    )
    grp_tot = a_tab.groupBy("grp").agg(F.sum("a").alias("g_tot"))
    term_tot = a_tab.groupBy("term").agg(F.sum("a").alias("t_tot"))
    n_tot = (a_tab.agg(F.sum("a")).collect()[0][0] or 0) or 1

    j = (
        a_tab.join(F.broadcast(grp_tot), "grp")
        .join(term_tot, "term")
        .select(
            "grp", "term", "a",
            (F.col("t_tot") - F.col("a")).alias("b"),
            (F.col("g_tot") - F.col("a")).alias("c"),
            (F.lit(n_tot) - F.col("g_tot") - F.col("t_tot")
             + F.col("a")).alias("d"),
        )
    )
    ad_bc = (F.col("a").cast("double") * F.col("d")
             - F.col("b").cast("double") * F.col("c"))
    den = (
        (F.col("a") + F.col("b")).cast("double")
        * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("d"))
    )
    chi2 = F.lit(float(n_tot)) * ad_bc * ad_bc / den
    milli = F.floor(chi2 * 1000.0 + 0.5).cast("long")
    scored = j.select(
        "grp", "term", "a", milli.alias("chi2_milli")
    ).filter(F.col("chi2_milli") > 0)
    wnd = Window.partitionBy("grp").orderBy(
        F.col("chi2_milli").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wnd))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("grp").alias(group_col), "term",
            F.col("a").cast("long").alias("n_in_group"),
            F.round(F.col("chi2_milli") / 1000.0, 4).alias("chi2"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
