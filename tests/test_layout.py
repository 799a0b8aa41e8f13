"""Ingest-time layout compaction (tables.optimize_layout).

The driver's parquet files are single-row-group singletons, which caps
scan parallelism at one task per table. optimize_layout rewrites them into
many row groups in a local cache; these tests pin that the rewrite is
(a) row-identical to the source, (b) actually multi-row-group, and
(c) correctly invalidated/bypassed.
"""

import os

import pyarrow.parquet as pq
import pytest

from hauser_spark.tables import (
    MIN_ROWS_PER_GROUP,
    load_table,
    optimize_layout,
    resolve_path,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def cache_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("layout")
    old = os.environ.get("SPARK_GRAFT_LAYOUT_CACHE")
    os.environ["SPARK_GRAFT_LAYOUT_CACHE"] = str(root)
    yield str(root)
    if old is None:
        os.environ.pop("SPARK_GRAFT_LAYOUT_CACHE", None)
    else:
        os.environ["SPARK_GRAFT_LAYOUT_CACHE"] = old


def test_compaction_splits_row_groups(cache_root):
    out = optimize_layout(SF, tables=("lineitem", "events"))
    li = pq.ParquetFile(os.path.join(out, "lineitem.parquet"))
    src = pq.ParquetFile(os.path.join(SF, "lineitem.parquet"))
    assert li.metadata.num_rows == src.metadata.num_rows
    expected = max(1, src.metadata.num_rows // MIN_ROWS_PER_GROUP)
    assert li.num_row_groups >= min(expected, 2)
    assert li.num_row_groups > src.num_row_groups


def test_compacted_data_is_row_identical(cache_root, spark):
    optimize_layout(SF, tables=("lineitem", "events"))
    for name, key in (("lineitem", None), ("events", None)):
        opt_path = resolve_path(SF, name)
        assert opt_path.startswith(cache_root), opt_path
        opt = load_table(spark, SF, name)
        os.environ["SPARK_GRAFT_NO_LAYOUT_OPT"] = "1"
        try:
            raw = load_table(spark, SF, name)
        finally:
            os.environ.pop("SPARK_GRAFT_NO_LAYOUT_OPT")
        assert opt.schema == raw.schema
        assert opt.count() == raw.count()
        # full-row symmetric difference must be empty
        assert opt.exceptAll(raw).count() == 0
        assert raw.exceptAll(opt).count() == 0


def test_stale_cache_is_bypassed(cache_root):
    optimize_layout(SF, tables=("nation",))
    assert resolve_path(SF, "nation").startswith(cache_root)
    # poison the manifest: fingerprint no longer matches → fall back to source
    manifest = os.path.join(cache_root, "sf0.01", "_manifest.json")
    with open(manifest) as f:
        text = f.read()
    with open(manifest, "w") as f:
        f.write(text.replace('"size":', '"size": 1, "was":'))
    assert resolve_path(SF, "nation") == os.path.join(SF, "nation.parquet")
