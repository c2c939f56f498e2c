"""Physical-plan audit helpers — the ".explain and iterate" loop made
assertable (SURVEY.md §4). Used by tests/test_plans.py to pin that:

  * small-dimension joins broadcast (no shuffled hash join of a dim),
  * scans prune columns (ReadSchema carries only what's selected),
  * filters push into the parquet scan (PushedFilters non-empty),
  * top-K compiles to TakeOrderedAndProject (partial heaps, no sort),
  * hot expressions stay inside WholeStageCodegen (no row-at-a-time
    Python in the plan unless it's the one permitted Arrow UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_shuffled_join(df: DataFrame) -> bool:
    p = executed_plan(df)
    return "SortMergeJoin" in p or "ShuffledHashJoin" in p


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the (first) parquet scan."""
    p = formatted_plan(df)
    for line in p.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            return [c.split(":")[0] for c in inner.split(",") if c]
    return []


def pushed_filters(df: DataFrame) -> str:
    p = formatted_plan(df)
    for line in p.splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            return line[len("PushedFilters:"):].strip()
    return ""


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in executed_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    return executed_plan(df).count("WholeStageCodegen")


def python_eval_count(df: DataFrame) -> int:
    """Arrow/pandas UDF stages in the plan (should be 0 for native-only
    operators, 1 where extraction/canonicalization is genuinely needed)."""
    p = executed_plan(df)
    return p.count("ArrowEvalPython") + p.count("BatchEvalPython")
