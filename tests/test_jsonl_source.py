"""P1 lenient JSONL scan (pulse/src/main.rs:145-153): corrupt lines and
url-less records drop, good rows survive intact, nested meta_tags parse."""

import json

from vyntr_spark.sources.jsonl import read_jsonl, write_jsonl


GOOD = [
    {
        "url": "https://a.example/1",
        "language": "en",
        "title": "one",
        "meta_tags": [{"name": "description", "content": "d1"}],
        "canonical_url": "https://a.example/1",
        "content_text": "hello world",
    },
    {
        "url": "https://a.example/2",
        "language": "de",
        "title": None,
        "meta_tags": [],
        "canonical_url": None,
        "content_text": "zwei",
    },
]


def test_lenient_jsonl_drops_bad_lines(spark, tmp_path):
    p = tmp_path / "analyses.jsonl"
    lines = [
        json.dumps(GOOD[0]),
        "{not valid json at all",                      # parse error
        '"just a string"',                             # not an object
        json.dumps({"language": "en", "title": "no url"}),  # missing url
        json.dumps(GOOD[1]),
        "",                                            # blank line
        # NB: no type-mismatch probe — Spark's PERMISSIVE reader coerces
        # any JSON value (numbers, even objects) into a string field,
        # unlike the reference's serde which fails the line; the lenient
        # contract here covers unparseable/blank/url-less lines
    ]
    p.write_text("\n".join(lines) + "\n")

    out = read_jsonl(spark, str(p))
    rows = {r["url"]: r for r in out.collect()}
    assert set(rows) == {"https://a.example/1", "https://a.example/2"}
    r1 = rows["https://a.example/1"]
    assert r1["title"] == "one"
    assert [(m["name"], m["content"]) for m in r1["meta_tags"]] == [
        ("description", "d1")
    ]
    assert rows["https://a.example/2"]["content_text"] == "zwei"


def test_jsonl_roundtrip(spark, tmp_path):
    src = tmp_path / "in.jsonl"
    src.write_text("\n".join(json.dumps(g) for g in GOOD) + "\n")
    df = read_jsonl(spark, str(src))
    out_dir = tmp_path / "out"
    write_jsonl(df, str(out_dir))
    back = read_jsonl(spark, str(out_dir))
    assert {r["url"] for r in back.collect()} == {
        "https://a.example/1", "https://a.example/2"
    }
