"""Round-11 driver-cost optimizations: the engine-level session knobs.

Two internals changed in the optimization round without touching what
any query computes:

- ``spark.python.sql.dataFrameDebugging.enabled=false`` (PySpark 4's
  per-call call-site capture costs ~5 py4j round-trips per DataFrame
  API call, paid inside every timed bench entry);
- a per-JVM-view cache for ``pyspark.sql.functions`` handle resolution
  (classic PySpark re-resolves the JVM function by reflection on every
  ``F.*`` call).

These tests pin the knobs on and prove the cached path still builds
working, correct Column expressions.
"""

from pyspark.sql import functions as F


def test_dataframe_debugging_disabled(spark):
    assert (
        spark.conf.get("spark.python.sql.dataFrameDebugging.enabled")
        == "false"
    )


def test_jvm_function_cache_installed():
    import pyspark.sql.functions.builtin as _fb

    assert getattr(_fb._get_jvm_function, "_hauser_cached", False)


def test_cached_functions_still_compute(spark):
    # repeated F.* calls (cache hits) must build identical working
    # expressions: a sum over a range and a string function round-trip
    df = spark.range(10).select(
        F.sum(F.col("id")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    row = df.collect()[0]
    assert (row["s"], row["n"]) == (45, 10)
    up = spark.range(1).select(F.upper(F.lit("ab")).alias("u")).collect()
    assert up[0]["u"] == "AB"


def test_cache_is_per_view_and_idempotent(spark):
    from hauser_spark.session import _install_jvm_function_cache

    import pyspark.sql.functions.builtin as _fb

    before = _fb._get_jvm_function
    _install_jvm_function_cache()  # second install must be a no-op
    assert _fb._get_jvm_function is before
