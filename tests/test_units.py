"""W7 full-table conversion (units.ts:21-196 data, convertUnit :364-423
semantics): ratio, temperature chain, fuel inversion, null on unknown or
cross-category pairs."""

import pytest

from vyntr_spark.operators.units import convert_units


@pytest.fixture(scope="module")
def conv(spark):
    rows = [
        (0, 100.0, "meters", "feet"),
        (1, 32.0, "fahrenheit", "celsius"),
        (2, 300.0, "kelvin", "rankine"),
        (3, 23.5, "milesPerGallon", "litersPer100km"),
        (4, 8.0, "litersPer100km", "kilometersPerLiter"),
        (5, 1.0, "gibibytes", "bytes"),
        (6, 10.0, "meters", "pounds"),     # cross-category
        (7, 5.0, "frobs", "meters"),       # unknown unit
        (8, 90.0, "degrees", "radians"),
    ]
    df = spark.createDataFrame(
        rows, "i long, value double, from_unit string, to_unit string"
    )
    return {r["i"]: r for r in convert_units(df).collect()}


def test_plain_ratio(conv):
    assert abs(conv[0]["result"] - 100 * 3.28084) < 1e-6
    assert conv[0]["category"] == "length"
    assert abs(conv[5]["result"] - 1 / 9.31323e-10) < 1e3


def test_temperature_chain(conv):
    assert abs(conv[1]["result"] - 0.0) < 1e-9          # 32F -> 0C
    assert abs(conv[2]["result"] - 540.0) < 1e-9        # 300K -> 540R


def test_fuel_inversion(conv):
    # REFERENCE semantics (units.ts:406-420), replicated verbatim: the
    # 'kmPerLiter' intermediate is actually the mpg-base value, so
    # to-L/100km is 100 / (value / from.multiplier) — parity over physics
    assert abs(conv[3]["result"] - 100 / (23.5 / 1.0)) < 1e-6
    # from-L/100km: baseValue = 100/value, result = base * to.multiplier
    assert abs(conv[4]["result"] - (100 / 8.0) * 0.425144) < 1e-6


def test_null_on_bad_pairs(conv):
    assert conv[6]["result"] is None
    assert conv[7]["result"] is None
    assert conv[7]["category"] is None


def test_angle(conv):
    assert abs(conv[8]["result"] - 90 * 0.0174533) < 1e-9
