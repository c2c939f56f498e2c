"""W7 full unit conversion (reference website/src/lib/utils/units.ts).

The UNITS table below is DATA mirrored from units.ts:21-196 (multipliers
to each category's base unit) — it must match for parity. Conversion
semantics replicate convertUnit (units.ts:364-423): base-multiplier
ratio, the explicit temperature chain through kelvin, and the inverse
fuel-economy special case for litersPer100km.

Spark shape: the table rides as a broadcast dimension; a conversion is
two broadcast joins (from-unit, to-unit constrained to the same
category) + native CASE exprs. No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# category -> unit -> multiplier (units.ts:21-196; data, not code)
UNITS: dict[str, dict[str, float]] = {
    "length": {
        "millimeters": 1000, "centimeters": 100, "meters": 1,
        "kilometers": 0.001, "inches": 39.3701, "feet": 3.28084,
        "yards": 1.09361, "miles": 0.000621371,
        "nauticalMiles": 0.000539957, "lightYears": 1.057e-16,
        "astronomicalUnits": 6.68459e-12, "parsecs": 3.24078e-17,
    },
    "area": {
        "squareMillimeters": 1000000, "squareCentimeters": 10000,
        "squareMeters": 1, "squareKilometers": 0.000001,
        "hectares": 0.0001, "squareInches": 1550, "squareFeet": 10.7639,
        "squareYards": 1.19599, "squareMiles": 3.86102e-7,
        "acres": 0.000247105,
    },
    "volume": {
        "cubicMillimeters": 1000000000, "cubicCentimeters": 1000000,
        "cubicMeters": 1, "liters": 1000, "milliliters": 1000000,
        "cubicInches": 61023.7, "cubicFeet": 35.3147,
        "cubicYards": 1.30795, "gallonsUS": 264.172,
        "gallonsUK": 219.969, "quartsUS": 1056.69, "pintsUS": 2113.38,
        "cupsUS": 4226.75, "fluidOuncesUS": 33814,
    },
    "mass": {
        "milligrams": 1000000, "grams": 1000, "kilograms": 1,
        "metricTons": 0.001, "ounces": 35.274, "pounds": 2.20462,
        "stones": 0.157473, "shortTons": 0.00110231,
        "longTons": 0.000984207, "carats": 5000, "grains": 15432.4,
    },
    "time": {
        "milliseconds": 86400000, "seconds": 86400, "minutes": 1440,
        "hours": 24, "days": 1, "weeks": 1 / 7, "months": 1 / 30.44,
        "years": 1 / 365.25, "decades": 1 / 3652.5,
        "centuries": 1 / 36525, "millennia": 1 / 365250,
    },
    "speed": {
        "metersPerSecond": 1, "kilometersPerHour": 3.6,
        "milesPerHour": 2.23694, "feetPerSecond": 3.28084,
        "knots": 1.94384, "mach": 0.00293858, "speedOfLight": 3.33564e-9,
    },
    "temperature": {
        "celsius": 1, "fahrenheit": 1.8, "kelvin": 1, "rankine": 1.8,
    },
    "energy": {
        "joules": 1, "kilojoules": 0.001, "calories": 0.239006,
        "kilocalories": 0.000239006, "wattHours": 0.000277778,
        "kilowattHours": 2.77778e-7, "btu": 0.000947817,
        "electronvolts": 6.242e18, "footPounds": 0.737562,
    },
    "pressure": {
        "pascals": 1, "hectopascals": 0.01, "kilopascals": 0.001,
        "bar": 1e-5, "atmospheres": 9.86923e-6, "torr": 0.00750062,
        "psi": 0.000145038,
    },
    "data": {
        "bits": 8, "bytes": 1, "kilobytes": 0.001, "megabytes": 1e-6,
        "gigabytes": 1e-9, "terabytes": 1e-12, "petabytes": 1e-15,
        "kibibytes": 0.0009765625, "mebibytes": 9.53674e-7,
        "gibibytes": 9.31323e-10, "tebibytes": 9.09495e-13,
    },
    "angle": {
        "degrees": 1, "radians": 0.0174533, "gradians": 1.11111,
        "arcminutes": 60, "arcseconds": 3600, "revolutions": 0.00277778,
    },
    "frequency": {
        "hertz": 1, "kilohertz": 0.001, "megahertz": 1e-6,
        "gigahertz": 1e-9, "revolutionsPerMinute": 60,
        "beatsPerMinute": 60,
    },
    "fuel": {
        "milesPerGallon": 1, "kilometersPerLiter": 0.425144,
        "litersPer100km": 235.215, "milesPerLiter": 0.264172,
    },
    "dataTransferRate": {
        "bitsPerSecond": 1, "kilobitsPerSecond": 0.001,
        "megabitsPerSecond": 1e-6, "gigabitsPerSecond": 1e-9,
        "bytesPerSecond": 0.125, "kilobytesPerSecond": 0.000125,
        "megabytesPerSecond": 1.25e-7, "gigabytesPerSecond": 1.25e-10,
    },
}


def units_table(spark) -> DataFrame:
    """(category, unit, multiplier) broadcast dimension."""
    rows = [
        (cat, unit, float(m))
        for cat, units in UNITS.items()
        for unit, m in units.items()
    ]
    return spark.createDataFrame(
        rows, "category string, unit string, multiplier double"
    )


def _temperature_result(v, fu, tu):
    """units.ts:378-404: explicit from->kelvin->to chain."""
    kelvin = (
        F.when(fu == "celsius", v + 273.15)
        .when(fu == "fahrenheit", (v - 32) / 1.8 + 273.15)
        .when(fu == "kelvin", v)
        .when(fu == "rankine", v / 1.8)
    )
    return (
        F.when(tu == "celsius", kelvin - 273.15)
        .when(tu == "fahrenheit", (kelvin - 273.15) * 1.8 + 32)
        .when(tu == "kelvin", kelvin)
        .when(tu == "rankine", kelvin * 1.8)
    )


def convert_units(df: DataFrame, value_col: str = "value",
                  from_col: str = "from_unit",
                  to_col: str = "to_unit") -> DataFrame:
    """convertUnit parity over a DataFrame of (value, from, to) rows:
    adds ``category`` and ``result`` (null when the pair is unknown or
    cross-category, like the reference returning null)."""
    spark = df.sparkSession
    ut = units_table(spark)
    f_t = ut.select(
        F.col("unit").alias(from_col),
        F.col("category"),
        F.col("multiplier").alias("_f_mult"),
    )
    t_t = ut.select(
        F.col("unit").alias(to_col),
        F.col("category"),
        F.col("multiplier").alias("_t_mult"),
    )
    j = df.join(F.broadcast(f_t), from_col, "left").join(
        F.broadcast(t_t), [to_col, "category"], "left"
    )
    v = F.col(value_col).cast("double")
    fu, tu = F.col(from_col), F.col(to_col)
    l100 = "litersPer100km"
    result = (
        F.when(F.col("_f_mult").isNull() | F.col("_t_mult").isNull(), F.lit(None))
        .when(F.col("category") == "temperature", _temperature_result(v, fu, tu))
        .when(
            (F.col("category") == "fuel") & (fu == l100) & (tu == l100), v
        )
        .when(
            (F.col("category") == "fuel") & (fu == l100),
            (100 / v) * F.col("_t_mult"),
        )
        .when(
            (F.col("category") == "fuel") & (tu == l100),
            100 / (v / F.col("_f_mult")),
        )
        .otherwise(v / F.col("_f_mult") * F.col("_t_mult"))
    )
    return j.withColumn("result", result).drop("_f_mult", "_t_mult")


def oracle_units_values() -> str:
    """DuckDB VALUES list generated from the SAME table (no drift)."""
    return ",".join(
        f"('{cat}','{unit}',{float(m)!r})"
        for cat, units in UNITS.items()
        for unit, m in units.items()
    )


# W7c: the full UNIT_ALIASES shorthand map (unitParser.ts:21-166 — data
# mirrored for parity, not code). Keys containing non-alphabetic
# characters ('km/h', 'mm²', '°c', ...) are kept for table breadth even
# though parseUnitQuery's word regex can never capture them — exactly
# the reference's behavior (the map is shared with other UI surfaces).
UNIT_ALIASES: dict[str, str] = {
    # length
    "mm": "millimeters", "cm": "centimeters", "m": "meters",
    "km": "kilometers", "in": "inches", "inch": "inches", "ft": "feet",
    "foot": "feet", "yd": "yards", "yard": "yards", "mi": "miles",
    "mile": "miles", "nm": "nauticalMiles",
    "nautical mile": "nauticalMiles", "light year": "lightYears",
    "light years": "lightYears", "au": "astronomicalUnits",
    "pc": "parsecs", "parsec": "parsecs",
    # area
    "mm²": "squareMillimeters", "cm²": "squareCentimeters",
    "m²": "squareMeters", "km²": "squareKilometers", "ha": "hectares",
    "hectare": "hectares", "in²": "squareInches", "ft²": "squareFeet",
    "yd²": "squareYards", "mi²": "squareMiles", "acre": "acres",
    # data storage & transfer
    "bit": "bits", "b": "bytes", "byte": "bytes", "kb": "kilobytes",
    "mb": "megabytes", "gb": "gigabytes", "tb": "terabytes",
    "pb": "petabytes", "kib": "kibibytes", "mib": "mebibytes",
    "gib": "gibibytes", "tib": "tebibytes", "bps": "bitsPerSecond",
    "kbps": "kilobitsPerSecond", "mbps": "megabitsPerSecond",
    "gbps": "gigabitsPerSecond", "b/s": "bytesPerSecond",
    "kb/s": "kilobytesPerSecond", "mb/s": "megabytesPerSecond",
    "gb/s": "gigabytesPerSecond",
    # energy
    "j": "joules", "joule": "joules", "kj": "kilojoules",
    "cal": "calories", "kcal": "kilocalories", "wh": "wattHours",
    "kwh": "kilowattHours", "ev": "electronvolts",
    # frequency
    "hz": "hertz", "khz": "kilohertz", "mhz": "megahertz",
    "ghz": "gigahertz", "rpm": "revolutionsPerMinute",
    "bpm": "beatsPerMinute",
    # fuel economy
    "mpg": "milesPerGallon", "km/l": "kilometersPerLiter",
    "l/100km": "litersPer100km", "mi/l": "milesPerLiter",
    # mass
    "mg": "milligrams", "g": "grams", "kg": "kilograms",
    "t": "metricTons", "oz": "ounces", "lb": "pounds", "lbs": "pounds",
    "st": "stones", "stone": "stones",
    # plane angle
    "deg": "degrees", "°": "degrees", "rad": "radians",
    "grad": "gradians", "gon": "gradians", "arcmin": "arcminutes",
    "arcsec": "arcseconds", "rev": "revolutions",
    # pressure
    "pa": "pascals", "hpa": "hectopascals", "kpa": "kilopascals",
    "atm": "atmospheres", "mmhg": "torr", "psi": "psi",
    # speed
    "m/s": "metersPerSecond", "km/h": "kilometersPerHour",
    "kph": "kilometersPerHour", "mph": "milesPerHour",
    "fps": "feetPerSecond", "ft/s": "feetPerSecond", "knot": "knots",
    # temperature
    "c": "celsius", "°c": "celsius", "celsius": "celsius",
    "f": "fahrenheit", "°f": "fahrenheit", "k": "kelvin", "r": "rankine",
    # time
    "ms": "milliseconds", "s": "seconds", "sec": "seconds",
    "min": "minutes", "h": "hours", "hr": "hours", "d": "days",
    "w": "weeks", "y": "years", "yr": "years",
}

# parseUnitQuery's four patterns (unitParser.ts:10-19), tried in order,
# FIRST MATCH WINS — even when its units later fail alias/category
# resolution (the reference returns null then; it never falls through
# to the next pattern). Same regex source works in Java (Spark) and
# RE2 (DuckDB): non-capturing groups, \d, \s, (?i) are common subset.
_NUM = r"(\d+(?:\.\d+)?)"
_WORDS = r"([a-zA-Z]+(?:\s+[a-zA-Z]+)*)"
UNIT_QUERY_PATTERNS: list[tuple[str, bool]] = [
    # (pattern, reversed) — reversed=True means groups are (to, value, from)
    (rf"(?i)convert\s+{_NUM}\s*{_WORDS}\s+to\s+{_WORDS}", False),
    (rf"(?i){_NUM}\s*{_WORDS}\s+to\s+{_WORDS}", False),
    (rf"(?i){_NUM}\s*{_WORDS}\s+in\s+{_WORDS}", False),
    (rf"(?i)how\s+many\s+{_WORDS}\s+in\s+{_NUM}\s*{_WORDS}", True),
]


def _alias_map_expr():
    """UNIT_ALIASES as a literal MapType expression — ~120 entries ride
    in the plan (broadcast-by-construction), the lookup is one native
    element_at, no join and no Python."""
    kv = []
    for k, v in UNIT_ALIASES.items():
        kv.extend([F.lit(k), F.lit(v)])
    return F.create_map(*kv)


def parse_unit_query(df: DataFrame, query_col: str = "q") -> DataFrame:
    """parseUnitQuery parity (unitParser.ts:168-214) over a DataFrame of
    query strings: adds (value, from_unit, to_unit) — nulls when no
    pattern matches. Unit texts are lowercased+trimmed, then resolved
    through UNIT_ALIASES with raw-text fallback, exactly like the
    reference; category resolution and the conversion itself live in
    convert_units (units.ts convertUnit twin)."""
    q = F.col(query_col)
    amap = _alias_map_expr()

    # pattern priority via one chained CASE on "did pattern i match"
    val, ftxt, ttxt = None, None, None
    for pat, rev in UNIT_QUERY_PATTERNS:
        hit = F.regexp_extract(q, pat, 0) != ""
        g = lambda i: F.regexp_extract(q, pat, i)
        v = g(2) if rev else g(1)
        ft = g(3) if rev else g(2)
        tt = g(1) if rev else g(3)
        if val is None:
            val = F.when(hit, v)
            ftxt = F.when(hit, ft)
            ttxt = F.when(hit, tt)
        else:
            val = val.when(hit, v)
            ftxt = ftxt.when(hit, ft)
            ttxt = ttxt.when(hit, tt)

    ftxt = F.lower(F.trim(ftxt))
    ttxt = F.lower(F.trim(ttxt))
    return df.withColumns({
        "value": val.cast("double"),
        "from_unit": F.coalesce(F.element_at(amap, ftxt), ftxt),
        "to_unit": F.coalesce(F.element_at(amap, ttxt), ttxt),
    })


def oracle_alias_case(col: str) -> str:
    """DuckDB CASE expression replaying UNIT_ALIASES (generated from the
    same dict — no drift), with raw-text fallback."""
    whens = " ".join(
        f"WHEN {col} = '{k}' THEN '{v}'"
        for k, v in UNIT_ALIASES.items()
        if "'" not in k  # no quoted keys exist; guard stays for safety
    )
    return f"(CASE {whens} ELSE {col} END)"
