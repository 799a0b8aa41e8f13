"""values_df — the VALUES-literal replacement for small driver-side
createDataFrame frames (wave 15): must be bit-exact vs createDataFrame
and must plan as a LocalTableScan (no Python-RDD scan tasks)."""

from hauser_spark.tables import values_df


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_exact_match_vs_createdataframe(spark):
    rows = [
        (0, 2**40 + 7, 0.1 + 0.2, "plain"),
        (1, -3, 1.25e-17, "qu'ote and back\\slash"),
        (2, None, float(2**53 - 1), None),
        (3, 0, -0.0, "unicode åß∂"),
    ]
    schema = "a int, b long, c double, d string"
    a = spark.createDataFrame(rows, schema)
    b = values_df(spark, rows, schema)
    assert a.dtypes == b.dtypes
    assert _rows(a) == _rows(b)


def test_plans_as_local_table_scan(spark):
    df = values_df(spark, [(1, "x")], "k int, v string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "Scan ExistingRDD" not in plan


def test_empty_rows_fallback(spark):
    df = values_df(spark, [], "k int, v string")
    assert df.count() == 0
    assert df.dtypes == [("k", "int"), ("v", "string")]
