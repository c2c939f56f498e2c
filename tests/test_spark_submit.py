"""North-rule packaging contract: the engine must run via
``spark-submit --py-files vyntr_spark.zip job.py`` (BASELINE.json
north_rule; reference deploys genesis as a single binary —
genesis/src/main.rs — the Spark analog is a py-files zip shipped to
every executor).

The test builds the zip with ``session._package_zip`` and launches a
REAL ``spark-submit`` subprocess from a scratch cwd with the repo
scrubbed from PYTHONPATH, so both the driver and the Python workers can
only import ``vyntr_spark`` from the ``--py-files`` zip. The job runs
the canonicalizer (native exprs) AND the Arrow extract UDF (executor-
side Python import) end-to-end and prints a checkable marker.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pyspark

from vyntr_spark.session import _package_zip

JOB = """
import sys
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.appName("pyfiles-smoke")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

# imports resolve from the --py-files zip (repo is not on sys.path)
from vyntr_spark.operators.extract_udf import extract_udf, normalize_udf

rows = [
    ("HTTP://Example.COM:80/a/../b/?utm_source=x&q=1#frag",
     b"<html><title>T</title><body><p>hello world</p>"
     b"<a href='/next'>n</a></body></html>"),
    ("https://host.test/dir/page",
     b"<html><body><p>second page</p></body></html>"),
]
df = spark.createDataFrame(rows, "url string, html binary")
out = (
    df.select(
        normalize_udf(F.col("url")).alias("canon"),
        extract_udf(F.col("html"), F.col("url")).alias("ex"),
    )
    .select("canon", F.col("ex.content_text").alias("text"),
            F.size("ex.links").alias("n_links"))
    .orderBy("canon")
    .collect()
)
for r in out:
    print(f"PYFILES_ROW\\t{r['canon']}\\t{r['text']}\\t{r['n_links']}")
print(f"PYFILES_OK\\t{len(out)}")
spark.stop()
"""


def test_spark_submit_pyfiles(tmp_path):
    zip_path = _package_zip()
    job = tmp_path / "job.py"
    job.write_text(JOB)

    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                          "spark-submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # zip must be the only import source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [submit, "--master", "local[2]", "--py-files", zip_path, str(job)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("PYFILES")]
    assert f"PYFILES_OK\t2" in lines[-1]
    rows = [ln.split("\t") for ln in lines if ln.startswith("PYFILES_ROW")]
    # both UDFs ran inside Python workers (executor-side zip import):
    # Url::parse-parity canonicalization (case/port/dot-segments) and
    # the Arrow extraction kernel
    by_canon = {r[1]: (r[2], r[3]) for r in rows}
    key = "http://example.com/b/?utm_source=x&q=1#frag"
    assert by_canon[key] == ("hello world", "1")
    assert by_canon["https://host.test/dir/page"] == ("second page", "0")


def test_iceberg_config_hook():
    """The production Iceberg flag path must not bit-rot (VERDICT r4
    "what's missing" #2): iceberg_configs() builds the exact config map
    a cluster deployment passes (get_spark(extra=...) or spark-submit
    --packages). Offline smoke: assert the documented Iceberg key
    shapes; only the jar fetch needs a network."""
    from vyntr_spark.session import ICEBERG_PACKAGE, iceberg_configs

    cfg = iceberg_configs(catalog="prod", warehouse="s3://bucket/wh")
    assert cfg["spark.jars.packages"] == ICEBERG_PACKAGE
    assert ICEBERG_PACKAGE.startswith(
        "org.apache.iceberg:iceberg-spark-runtime-")
    assert cfg["spark.sql.extensions"] == (
        "org.apache.iceberg.spark.extensions"
        ".IcebergSparkSessionExtensions")
    assert cfg["spark.sql.catalog.prod"] == \
        "org.apache.iceberg.spark.SparkCatalog"
    assert cfg["spark.sql.catalog.prod.type"] == "hadoop"
    assert cfg["spark.sql.catalog.prod.warehouse"] == "s3://bucket/wh"
    # rest-catalog form omits the warehouse (server-side concern)
    rest = iceberg_configs(catalog="c", impl="rest")
    assert rest["spark.sql.catalog.c.type"] == "rest"
    assert "spark.sql.catalog.c.warehouse" not in rest
    # every key is a plain spark conf string (builder-compatible)
    assert all(isinstance(k, str) and isinstance(v, str)
               for k, v in cfg.items())
