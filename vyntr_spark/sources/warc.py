"""WARC source/sink — Common Crawl's native archive format.

A minimal, dependency-free WARC/1.0 implementation of the subset the
crawl pipeline needs: ``response`` records carrying (WARC-Target-URI,
WARC-Date, payload = raw html bytes). The ISO 28500 framing is
record-header block, CRLF CRLF, payload, CRLF CRLF. Real Common Crawl
WARCs gzip each record as an independent member; this sandbox has no
per-member gzip writer requirement, so records are stored uncompressed
and the reader is tolerant of either (it unzips whole-file gzip too).

Reader plan (scale-first): ``spark.read.format("binaryFile")`` lists
files into scan tasks (one task per file — WARC's unit of parallelism on
Common Crawl is the ~1 GB warc file, of which a crawl ships hundreds of
thousands), then an Arrow-batched ``mapInPandas`` parses records. No
driver-side file IO, no per-row Python UDF; corrupt records are SKIPPED
and counted, never fatal (a multi-TB archive read must not die on one
truncated record).

Writer plan: one ``.warc`` file per partition written executor-side via
``mapPartitions`` (returning one (path, n_records) row per file). The
sandbox writes to the local FS; on a cluster the same code targets a
fuse/NFS mount, or swap the ``open`` for the Hadoop FS API.
"""

from __future__ import annotations

import gzip
import io
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"

WARC_READ_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("warc_file", T.StringType(), True),
    ]
)


def format_record(url: str, ts_iso: str, payload: bytes) -> bytes:
    """One uncompressed WARC/1.0 response record (ISO 28500 framing)."""
    headers = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        + b"WARC-Date: " + ts_iso.encode("ascii") + _CRLF
        + b"WARC-Record-ID: <urn:uuid:"
        + uuid.uuid5(uuid.NAMESPACE_URL, url).hex.encode("ascii") + b">" + _CRLF
        + b"Content-Type: text/html" + _CRLF
        + b"Content-Length: " + str(len(payload)).encode("ascii") + _CRLF
    )
    return headers + _CRLF + payload + _CRLF + _CRLF


def format_conversion_record(url: str, ts_iso: str, text: str) -> bytes:
    """One uncompressed WET-style ``conversion`` record (the format of
    Common Crawl's *.wet text sidecars: same ISO 28500 framing as WARC,
    WARC-Type conversion, text/plain payload = the extracted text)."""
    payload = text.encode("utf-8")
    headers = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: conversion" + _CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        + b"WARC-Date: " + ts_iso.encode("ascii") + _CRLF
        + b"WARC-Record-ID: <urn:uuid:"
        + uuid.uuid5(uuid.NAMESPACE_URL, url).hex.encode("ascii") + b">" + _CRLF
        + b"Content-Type: text/plain" + _CRLF
        + b"Content-Length: " + str(len(payload)).encode("ascii") + _CRLF
    )
    return headers + _CRLF + payload + _CRLF + _CRLF


def parse_warc_bytes(data: bytes, fname: str = "",
                     record_type: bytes = b"response"):
    """Yield (url, ts_iso, payload) per well-formed record of
    ``record_type`` (``response`` for WARC html, ``conversion`` for WET
    text); skip anything malformed (bad header block, short payload)."""
    if data[:2] == b"\x1f\x8b":  # whole-file gzip
        try:
            data = gzip.decompress(data)
        except OSError:
            return
    buf = io.BytesIO(data)
    while True:
        # seek the next record header block
        line = buf.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            continue
        hdrs = {}
        ok = True
        while True:
            h = buf.readline()
            if h in (_CRLF, b"\n"):
                break
            if not h:
                ok = False
                break
            if b":" in h:
                k, _, v = h.partition(b":")
                hdrs[k.strip().lower()] = v.strip()
            else:
                ok = False
                break
        if not ok:
            return
        try:
            n = int(hdrs.get(b"content-length", b""))
        except ValueError:
            continue  # unusable record; resync on the next WARC/ line
        payload = buf.read(n)
        if len(payload) != n:
            return  # truncated tail
        if (
            hdrs.get(b"warc-type") == record_type
            and b"warc-target-uri" in hdrs
            and b"warc-date" in hdrs
        ):
            yield (
                hdrs[b"warc-target-uri"].decode("utf-8", "replace"),
                hdrs[b"warc-date"].decode("ascii", "replace"),
                payload,
            )


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files → (url, warc_ts, html, warc_file). One scan task per
    file via binaryFile; Arrow-batched parse; corrupt records skipped."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, data in zip(pdf["path"], pdf["content"]):
                for url, ts_iso, payload in parse_warc_bytes(bytes(data), fname):
                    rows.append((url, ts_iso, payload, fname))
            out = pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "warc_file"]
            )
            out["warc_ts"] = pd.to_datetime(
                out["warc_ts"], errors="coerce", utc=True
            ).dt.tz_localize(None)
            yield out

    src = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )
    return src.mapInPandas(parse, WARC_READ_SCHEMA)


WET_READ_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("wet_file", T.StringType(), True),
    ]
)


def read_wet(spark: SparkSession, path_glob: str) -> DataFrame:
    """WET files → (url, warc_ts, text, wet_file). Same scale plan as
    :func:`read_warc` (one binaryFile scan task per archive file,
    Arrow-batched parse, corrupt records skipped); conversion-record
    payloads decode as UTF-8 with replacement (a multi-TB text archive
    must not die on one mojibake record)."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, data in zip(pdf["path"], pdf["content"]):
                for url, ts_iso, payload in parse_warc_bytes(
                    bytes(data), fname, record_type=b"conversion"
                ):
                    rows.append(
                        (url, ts_iso, payload.decode("utf-8", "replace"),
                         fname)
                    )
            out = pd.DataFrame(
                rows, columns=["url", "warc_ts", "text", "wet_file"]
            )
            out["warc_ts"] = pd.to_datetime(
                out["warc_ts"], errors="coerce", utc=True
            ).dt.tz_localize(None)
            yield out

    src = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )
    return src.mapInPandas(parse, WET_READ_SCHEMA)


def write_wet(df: DataFrame, out_dir: str,
              url_col: str = "url", ts_col: str = "warc_ts",
              text_col: str = "text") -> DataFrame:
    """extracted-text DataFrame → one .wet file per partition, written
    on the executors (the sink that turns a crawl's extraction output
    into Common-Crawl-shaped text sidecars). Returns (wet_file,
    n_records); call an action to materialize."""
    os.makedirs(out_dir, exist_ok=True)
    cols = df.select(
        F.col(url_col).alias("url"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        F.col(text_col).alias("text"),
    )

    def dump(idx, it):
        path = os.path.join(out_dir, f"part-{idx:05d}.wet")
        n = 0
        f = None
        try:
            for row in it:
                if f is None:
                    f = open(path, "wb")
                f.write(
                    format_conversion_record(
                        row["url"] or "", row["ts"] or "", row["text"] or ""
                    )
                )
                n += 1
        finally:
            if f is not None:
                f.close()
        if n:
            yield (path, n)

    schema = T.StructType(
        [
            T.StructField("wet_file", T.StringType(), False),
            T.StructField("n_records", T.LongType(), False),
        ]
    )
    return df.sparkSession.createDataFrame(
        cols.rdd.mapPartitionsWithIndex(dump), schema
    )


def write_warc(df: DataFrame, out_dir: str,
               url_col: str = "url", ts_col: str = "warc_ts",
               html_col: str = "html") -> DataFrame:
    """pages-shaped DataFrame → one .warc file per partition, written on
    the executors. Returns (warc_file, n_records) — call an action on it
    to materialize. Rows inside a file follow partition order; pass a
    sorted/repartitioned df if file layout matters."""
    os.makedirs(out_dir, exist_ok=True)
    cols = df.select(
        F.col(url_col).alias("url"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        F.col(html_col).alias("html"),
    )

    def dump(idx, it):
        path = os.path.join(out_dir, f"part-{idx:05d}.warc")
        n = 0
        f = None
        try:
            for row in it:
                if f is None:
                    f = open(path, "wb")
                payload = bytes(row["html"]) if row["html"] is not None else b""
                f.write(format_record(row["url"] or "", row["ts"] or "",
                                      payload))
                n += 1
        finally:
            if f is not None:
                f.close()
        if n:
            yield (path, n)

    schema = T.StructType(
        [
            T.StructField("warc_file", T.StringType(), False),
            T.StructField("n_records", T.LongType(), False),
        ]
    )
    return df.sparkSession.createDataFrame(
        cols.rdd.mapPartitionsWithIndex(dump), schema
    )
