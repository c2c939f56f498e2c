"""W-table breadth surfaces added in r3: parseUnitQuery + UNIT_ALIASES
(unitParser.ts), parseDateQuery grammar (date.ts), full-shape bang table
+ handleBangQuery (bangs.ts / utils/bangs.ts). The gate oracles check
these end-to-end against independent SQL; these tests pin the edge
semantics the fixtures don't reach."""

from pyspark.sql import functions as F

from vyntr_spark.operators.serving import parse_date_query_df
from vyntr_spark.operators.units import convert_units, parse_unit_query
from vyntr_spark.sources.bangs import bang_resolve, synth_bangs


def _one(df):
    rows = df.collect()
    assert len(rows) == 1, rows
    return rows[0]


def test_parse_unit_query_patterns(spark):
    cases = [
        # (query, value, from_unit, to_unit)
        ("convert 5 km to miles", 5.0, "kilometers", "miles"),
        ("12.5 kg in lbs", 12.5, "kilograms", "pounds"),
        ("how many miles in 26.2 km", 26.2, "kilometers", "miles"),
        # multi-word alias through the word regex
        ("3 nautical mile to km", 3.0, "nauticalMiles", "kilometers"),
        # unknown text falls through lowercased (reference fallback)
        ("7 blorps to meters", 7.0, "blorps", "meters"),
    ]
    df = spark.createDataFrame([(q,) for q, *_ in cases], "q string")
    got = {r["q"]: r for r in parse_unit_query(df).collect()}
    for q, v, fu, tu in cases:
        r = got[q]
        assert (r["value"], r["from_unit"], r["to_unit"]) == (v, fu, tu), q


def test_parse_unit_query_no_match_is_null(spark):
    df = spark.createDataFrame([("what is love",)], "q string")
    r = _one(parse_unit_query(df))
    assert r["value"] is None and r["from_unit"] is None


def test_unit_parse_conversion_end_to_end(spark):
    df = spark.createDataFrame([("how many f in 100 c",)], "q string")
    r = _one(convert_units(parse_unit_query(df)))
    assert r["category"] == "temperature"
    assert abs(r["result"] - 212.0) < 1e-9


def test_date_parse_lookback_and_order(spark):
    df = spark.createDataFrame(
        [("days since labor day",), ("days until labor day",),
         ("weeks until easter monday",), ("nope",)],
        "q string",
    )
    got = {r["q"]: r for r in parse_date_query_df(df).collect()}
    # pinned today = 2025-06-15: labor day back = 2024-09-02 (last yr),
    # forward = 2025-09-01
    assert got["days since labor day"]["target_date"] == "2024-09-02"
    assert got["days until labor day"]["target_date"] == "2025-09-01"
    # 'easter monday' contains 'easter' -> first table key wins, like
    # the reference's Object.entries loop
    assert got["weeks until easter monday"]["description"] == "Easter Sunday"
    assert got["nope"]["unit"] is None


def test_date_parse_freetext_shapes(spark):
    # W6d (date.ts:344-351): the new Date(query) fallback's
    # deterministic shapes — ISO strict, D-month-YYYY, month-D-YYYY
    # with JS day rollover, year-less month-D -> 2001 (V8 quirk) —
    # and precedence: holidays/'tomorrow' still beat freetext; all
    # OFF unless freetext=True (w6c behavior unchanged).
    rows = [("days until 2027-03-03",), ("weeks until 3 march 2027",),
            ("days since march 3",), ("days until february 30 2027",),
            ("days until 2027-02-30",), ("seconds to dec 25, 2030",),
            ("days until christmas",), ("days until tomorrow",),
            ("days until notamonth 3",)]
    df = spark.createDataFrame(rows, "q string")
    got = {r["q"]: r for r in
           parse_date_query_df(df, freetext=True).collect()}
    assert got["days until 2027-03-03"]["target_date"] == "2027-03-03"
    assert got["days until 2027-03-03"]["description"] == ""
    assert got["weeks until 3 march 2027"]["target_date"] == "2027-03-03"
    # year-less -> 2001 (new Date('march 3') == Mar 3 2001 in V8)
    assert got["days since march 3"]["target_date"] == "2001-03-03"
    # JS rollover: new Date('february 30 2027') -> Mar 2 2027
    assert got["days until february 30 2027"]["target_date"] == "2027-03-02"
    # ISO is strict: new Date('2027-02-30') -> Invalid Date
    assert got["days until 2027-02-30"]["target_date"] is None
    assert got["seconds to dec 25, 2030"]["target_date"] == "2030-12-25"
    assert got["days until christmas"]["description"] == "Christmas Day"
    assert got["days until tomorrow"]["description"] == "Tomorrow"
    assert got["days until notamonth 3"]["target_date"] is None
    # default path ignores freetext entirely
    off = {r["q"]: r for r in parse_date_query_df(df).collect()}
    assert off["days until 2027-03-03"]["target_date"] is None


def test_date_parse_amount_units(spark):
    df = spark.createDataFrame([("hours until tomorrow",)], "q string")
    r = _one(parse_date_query_df(df))
    assert r["delta_ms"] == 86_400_000
    assert r["amount"] == 24.0


def test_bang_first_match_skips_unknown(spark):
    bangs = synth_bangs(spark, 100)
    df = spark.createDataFrame(
        [("a !unknown b !b5 c",), ("!b7 solo",), ("none here",)],
        "q string",
    )
    got = {r["q"]: r for r in bang_resolve(df, bangs).collect()}
    assert set(got) == {"a !unknown b !b5 c", "!b7 solo"}
    r = got["a !unknown b !b5 c"]
    assert r["bang"] == "b5"
    # matched word removed by POSITION; the unknown bang word survives
    assert "q=a%20!unknown%20b%20c" in r["redirect_url"]


def test_bang_case_folding_and_encoding(spark):
    bangs = synth_bangs(spark, 100)
    df = spark.createDataFrame([("X+Y !B9 100%",)], "q string")
    r = _one(bang_resolve(df, bangs))
    assert r["bang"] == "b9"
    assert "q=X%2BY%20100%25" in r["redirect_url"]


def test_synth_bangs_shape(spark):
    b = synth_bangs(spark, 1000)
    assert b.columns == ["c", "d", "r", "s", "sc", "t", "u"]
    assert b.count() == 1000
    assert b.select("t").distinct().count() == 1000
    assert _one(b.filter(F.col("t") == "b42"))["u"].count("{{{s}}}") == 1
