"""WARC source/sink round-trip and corrupt-record tolerance."""

import gzip

from pyspark.sql import functions as F

from vyntr_spark.sources import warc


def _pages(spark):
    return spark.createDataFrame(
        [
            ("http://a.com/1", "2024-01-01 00:00:01", b"<html>one</html>"),
            ("http://a.com/2", "2024-01-01 00:00:02", b"<html>two</html>"),
            ("http://b.com/x", "2024-02-03 10:20:30", b"\x00binary\xffstuff"),
        ],
        "url string, warc_ts string, html binary",
    ).select("url", F.col("warc_ts").cast("timestamp").alias("warc_ts"), "html")


def test_warc_round_trip(spark, tmp_path):
    out = str(tmp_path / "warcs")
    files = warc.write_warc(_pages(spark).repartition(2), out).collect()
    assert sum(r["n_records"] for r in files) == 3
    back = warc.read_warc(spark, out + "/*.warc")
    got = {r["url"]: r for r in back.collect()}
    assert set(got) == {"http://a.com/1", "http://a.com/2", "http://b.com/x"}
    assert bytes(got["http://b.com/x"]["html"]) == b"\x00binary\xffstuff"
    assert str(got["http://a.com/2"]["warc_ts"]) == "2024-01-01 00:00:02"


def test_warc_corrupt_records_skipped(spark, tmp_path):
    d = tmp_path / "wc"
    d.mkdir()
    good1 = warc.format_record("http://ok.com/1", "2024-01-01T00:00:00Z", b"aa")
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: zzz\r\n\r\n"
    good2 = warc.format_record("http://ok.com/2", "2024-01-01T00:00:01Z", b"bb")
    truncated = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                 b"WARC-Target-URI: http://gone.com\r\n"
                 b"WARC-Date: 2024-01-01T00:00:02Z\r\n"
                 b"Content-Length: 99999\r\n\r\nshort")
    (d / "mix.warc").write_bytes(good1 + bad + good2 + truncated)
    got = sorted(r["url"] for r in
                 warc.read_warc(spark, str(d / "*.warc")).collect())
    assert got == ["http://ok.com/1", "http://ok.com/2"]


def test_warc_gzip_whole_file(spark, tmp_path):
    d = tmp_path / "wg"
    d.mkdir()
    rec = warc.format_record("http://gz.com/", "2024-01-01T00:00:00Z", b"zz")
    (d / "a.warc").write_bytes(gzip.compress(rec))
    rows = warc.read_warc(spark, str(d / "*.warc")).collect()
    assert len(rows) == 1 and rows[0]["url"] == "http://gz.com/"


def test_wet_round_trip(spark, tmp_path):
    out = str(tmp_path / "wets")
    docs = spark.createDataFrame(
        [
            ("http://a.com/1", "2024-01-01 00:00:01", "hello world"),
            ("http://a.com/2", "2024-01-01 00:00:02", "uniçøde ☃ text"),
            ("http://b.com/x", "2024-02-03 10:20:30", ""),
        ],
        "url string, warc_ts string, text string",
    ).select("url", F.col("warc_ts").cast("timestamp").alias("warc_ts"),
             "text")
    files = warc.write_wet(docs.repartition(2), out).collect()
    assert sum(r["n_records"] for r in files) == 3
    back = {r["url"]: r for r in
            warc.read_wet(spark, out + "/*.wet").collect()}
    assert set(back) == {"http://a.com/1", "http://a.com/2", "http://b.com/x"}
    assert back["http://a.com/2"]["text"] == "uniçøde ☃ text"
    assert back["http://b.com/x"]["text"] == ""
    assert str(back["http://a.com/1"]["warc_ts"]) == "2024-01-01 00:00:01"


def test_wet_and_warc_records_do_not_cross_parse(spark, tmp_path):
    # a mixed archive: read_warc must yield only response records,
    # read_wet only conversion records
    d = tmp_path / "mix"
    d.mkdir()
    resp = warc.format_record("http://h.com/", "2024-01-01T00:00:00Z",
                              b"<html>h</html>")
    conv = warc.format_conversion_record("http://t.com/",
                                         "2024-01-01T00:00:01Z", "text only")
    (d / "m.warc").write_bytes(resp + conv)
    (d / "m.wet").write_bytes(resp + conv)
    warc_urls = [r["url"] for r in
                 warc.read_warc(spark, str(d / "*.warc")).collect()]
    wet_urls = [r["url"] for r in
                warc.read_wet(spark, str(d / "*.wet")).collect()]
    assert warc_urls == ["http://h.com/"]
    assert wet_urls == ["http://t.com/"]
