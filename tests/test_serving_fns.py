"""Pure-function operators: W9 math eval (shunting-yard), W6 date
computus, P6 query parser — reference-semantics unit tests."""

import pytest

from vyntr_spark.operators.pulse import parse_query
from vyntr_spark.operators.serving import easter_date, math_eval, nth_weekday


@pytest.mark.parametrize("expr,expected", [
    ("2+3*4", 14.0),
    ("(2+3)*4", 20.0),
    ("2^3^2", 512.0),          # right-assoc power (math.ts semantics)
    ("10/4", 2.5),
    ("sqrt(16)+abs(-2)", 6.0),
    ("floor(2.7)+ceil(2.2)", 5.0),
    ("round(2.5)", 2.0),        # python banker's rounding, documented
    ("log(100)", 2.0),
    ("-3+5", 2.0),
    ("2*-3", -6.0),
])
def test_math_eval(expr, expected):
    assert math_eval(expr) == pytest.approx(expected)


def test_math_eval_constants():
    import math

    assert math_eval("sin(pi/2)") == pytest.approx(1.0)
    assert math_eval("ln(e)") == pytest.approx(1.0)
    assert math_eval("pi*2") == pytest.approx(2 * math.pi)


@pytest.mark.parametrize("bad", ["", "1/0", "wat?", "((1+2)", "1+", "sin()", "1 2"])
def test_math_eval_errors(bad):
    assert math_eval(bad) is None


@pytest.mark.parametrize("year,expected", [
    (2024, "2024-03-31"), (2025, "2025-04-20"), (2026, "2026-04-05"),
    (2000, "2000-04-23"), (1999, "1999-04-04"),
])
def test_easter(year, expected):
    assert str(easter_date(year)) == expected


def test_nth_weekday():
    # 4th Thursday of November 2026 (Thanksgiving)
    assert str(nth_weekday(2026, 11, 3, 4)) == "2026-11-26"
    # 1st Monday of September 2025 (Labor Day)
    assert str(nth_weekday(2025, 9, 0, 1)) == "2025-09-01"


def test_parse_query():
    pq = parse_query("spark data AND window NOT nsfw:true -slow lang:en +fast")
    assert pq.terms == ["spark", "data"]
    assert pq.must == ["window", "fast"]
    assert pq.must_not == ["slow"]
    assert pq.fields == {"nsfw": "false", "lang": "en"}


def test_parse_query_edge():
    pq = parse_query("NOT bad OR good field:v")
    assert pq.must_not == ["bad"]
    assert pq.terms == ["good"]
    assert pq.fields == {"field": "v"}
    assert parse_query("").terms == []
