"""Arrow-vectorized extraction + canonicalization UDFs (operators C15/C2).

These are the engine's only Python hot spots (SURVEY.md §2 UDF surface):
everything else — gates, link filters, joins, windows — is native
Catalyst-optimizable expressions. Batches cross the JVM/Python boundary
as Arrow (pandas_udf), never row-at-a-time.

Reference parity: the extraction semantics live in vyntr_spark.extract
(byte-identical contract, genesis/src/html_parser.rs:17-162); the
canonicalizer in vyntr_spark.canonicalize (genesis/src/utils.rs:5-8).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from ..canonicalize import try_domain, try_normalize
from ..extract import extract_html
from ..tables import META_TAG

EXTRACTED = T.StructType(
    [
        T.StructField("links", T.ArrayType(T.StringType()), False),
        T.StructField("language", T.StringType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("meta_tags", T.ArrayType(META_TAG), False),
        T.StructField("canonical_url", T.StringType(), True),
        T.StructField("content_text", T.StringType(), False),
    ]
)


@pandas_udf(EXTRACTED)
def extract_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    """html binary + base url -> extraction struct (one Arrow batch)."""
    links, language, title, metas, canon, text = [], [], [], [], [], []
    for h, u in zip(html, url):
        if h is None:
            links.append([]); language.append(""); title.append("")
            metas.append([]); canon.append(None); text.append("")
            continue
        r = extract_html(h, u)
        links.append(r.links)
        language.append(r.language)
        title.append(r.title)
        metas.append([{"name": n, "content": c} for n, c in r.meta_tags])
        canon.append(r.canonical_url)
        text.append(r.content_text)
    return pd.DataFrame(
        {
            "links": links,
            "language": language,
            "title": title,
            "meta_tags": metas,
            "canonical_url": canon,
            "content_text": text,
        }
    )


@pandas_udf(T.StringType())
def normalize_udf(url: pd.Series) -> pd.Series:
    """C2: WHATWG canonicalization; None for unparseable URLs."""
    return url.map(lambda u: None if u is None else try_normalize(u))


@pandas_udf(T.StringType())
def domain_udf(url: pd.Series) -> pd.Series:
    """C3: host extraction; None when the URL has no host."""
    return url.map(lambda u: None if u is None else try_domain(u))


def sanitize_col(col):
    """C18 (genesis/src/db.rs:63-67): strip Unicode Cc control chars —
    native regexp_replace, kept out of Python."""
    return F.regexp_replace(col, "[\\x00-\\x1F\\x7F-\\x9F]", "")
