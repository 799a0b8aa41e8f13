"""Property-based and fuzz tests — beyond the reference's own test
strategy (SURVEY §5: it has none of these): cross-engine rounding
equivalence, order-independence of money arithmetic, window-math
invariants, and a randomized transform fuzz against an independent
pure-Python reference of the Go transform semantics.
"""

import datetime as dt
import json
import random

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from hauser_spark.windows import next_bundle_window

UTC = dt.timezone.utc


# ---------------------------------------------------------- rounding

def _round_half_up(x: float, scale: int = 6) -> float:
    from hauser_spark.operators.multimodal import _round_half_up

    return _round_half_up(x, scale)


@settings(max_examples=300, deadline=None)
@given(
    units=st.integers(min_value=-10**15, max_value=10**15),
    digits=st.integers(min_value=0, max_value=9),
)
def test_round_half_up_matches_duckdb(units, digits):
    """Our Python-side SQL-ROUND replica agrees with DuckDB ROUND on every
    decimal representable in the data domain (≤9 fractional digits)."""
    x = units / (10**digits)
    got = _round_half_up(x, 6)
    want = duckdb.sql(f"SELECT ROUND(CAST({x!r} AS DOUBLE), 6)").fetchone()[0]
    assert got == want, (x, got, want)


# ---------------------------------------------------------- money_sum

@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-10**9, max_value=10**9).map(lambda c: c / 100.0),
        min_size=0,
        max_size=50,
    ),
    st.randoms(),
)
def test_money_sum_order_independent_and_cross_engine(values, rnd):
    """The integer-cent sum is invariant under permutation and matches
    DuckDB's money_sum_sql on the same rows — the property that makes
    distributed money aggregates deterministic."""
    from hauser_spark.functions import money_sum_sql

    def py_money_sum(vs):
        total = 0
        for v in vs:
            c = abs(v) * 100
            total += (1 if v >= 0 else -1) * int(c + 0.5)
        return total / 100.0

    shuffled = list(values)
    rnd.shuffle(shuffled)
    assert py_money_sum(values) == py_money_sum(shuffled)
    if values:
        rows = " UNION ALL ".join(f"SELECT CAST({v!r} AS DOUBLE) AS v" for v in values)
        got = duckdb.sql(
            f"SELECT {money_sum_sql('v')} FROM ({rows})"
        ).fetchone()[0]
        assert got == py_money_sum(values), (values, got)


# ---------------------------------------------------------- window math

@settings(max_examples=300, deadline=None)
@given(
    epoch_sec=st.integers(min_value=0, max_value=2**31),
    micros=st.integers(min_value=0, max_value=999_999),
    dur_min=st.sampled_from([15, 20, 30, 60, 120, 180, 240, 360, 480, 720, 1440]),
)
def test_window_alignment_invariants(epoch_sec, micros, dur_min):
    """W1 invariants for every valid duration (divides 24h): the window
    starts at the sync point, ends strictly later on an epoch-aligned
    boundary, and spans at most one duration."""
    last = dt.datetime.fromtimestamp(epoch_sec, UTC) + dt.timedelta(
        microseconds=micros
    )
    dur = dt.timedelta(minutes=dur_min)
    start, end = next_bundle_window(last, dur)
    assert start == last
    assert end > start
    assert end - start <= dur
    # epoch-aligned: end is a multiple of the duration
    assert int(end.timestamp() * 1_000_000) % int(dur.total_seconds() * 1_000_000) == 0
    # idempotence of alignment: the next window starts exactly at end
    start2, end2 = next_bundle_window(end, dur)
    assert start2 == end and end2 == end + dur


# ---------------------------------------------------------- transform fuzz

def _go_escape(s: str) -> str:
    return (
        s.replace("<", "\\u003c")
        .replace(">", "\\u003e")
        .replace("&", "\\u0026")
        .replace(" ", "\\u2028")
        .replace(" ", "\\u2029")
    )


def _expected_custom_vars(rec: dict) -> str:
    """Independent pure-Python rendering of the Go custom-vars pivot:
    byte-sorted keys, raw literal text for suffix-typed values, Go JSON
    string escaping otherwise, nulls omitted, empty ⇒ {}."""
    frags = []
    for k in sorted(rec):
        v = rec[k]
        if v is None:
            continue
        key = _go_escape(json.dumps(k, ensure_ascii=False))
        if k.lower().endswith(("_real", "_int", "_bool")):
            frags.append(f"{key}:{v}")
        else:
            frags.append(f"{key}:{_go_escape(json.dumps(v, ensure_ascii=False))}")
    return "{" + ",".join(frags) + "}"


def test_transform_custom_vars_fuzz(spark):
    """200 random records with adversarial custom-var keys/values (quotes,
    newlines, unicode, HTML chars, suffix-typed numerics, nulls) — the
    Catalyst pivot must byte-match the independent Python rendering."""
    from hauser_spark.schema import Schema, WarehouseField
    from hauser_spark.transform import build_parity_projection

    rng = random.Random(20260813)
    key_pool = [
        "evt_amount_real", "evt_n_int", "evt_ok_bool", "user_name_str",
        'we"ird', "unié", "a<b>&c", "line\\slash", "tab_key",
    ]
    val_pool = [
        '"quoted"', "new\nline", "tab\there", "unié中", "<html>&amp;",
        "", "plain", "back\\slash",
    ]
    num_pool = ["1", "2.5", "-0.25", "1e3", "true", "false", "42"]

    records = []
    for i in range(200):
        rec = {"EventType": f"type{i % 7}"}
        for k in rng.sample(key_pool, rng.randint(0, len(key_pool))):
            if k.lower().endswith(("_real", "_int", "_bool")):
                rec[k] = rng.choice(num_pool)
            else:
                rec[k] = rng.choice(val_pool) if rng.random() > 0.1 else None
        records.append(rec)

    all_keys = sorted({k for r in records for k in r})
    rows = [tuple(r.get(k) for k in all_keys) for r in records]
    df = spark.createDataFrame(rows, schema=", ".join(f"`{k}` string" for k in all_keys))
    schema = Schema(
        [
            WarehouseField("EventType", "EventType", "string"),
            WarehouseField("CustomVars", "CustomVars", "string"),
        ]
    )
    got = [r["CustomVars"] for r in build_parity_projection(df, schema).collect()]
    want = [
        _expected_custom_vars({k: v for k, v in r.items() if k != "EventType"})
        for r in records
    ]
    assert got == want


# ---------------------------------------------------- morton interleave

def _morton_ref(a: int, b: int, bits: int = 16) -> int:
    """Independent pure-Python Morton reference: a's bits odd, b's even."""
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


@settings(max_examples=60, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_interleave_expr_matches_reference(spark, pairs):
    """The z-order bit-interleave SQL expression must agree with an
    independent Python reference on arbitrary 16-bit grid cells — and
    therefore preserve the Morton curve's locality guarantees."""
    from hauser_spark.tables import _interleave_bits_expr

    df = spark.createDataFrame(pairs, ["ga", "gb"]).selectExpr(
        "ga", "gb", _interleave_bits_expr("ga", "gb") + " AS z"
    )
    for r in df.collect():
        assert r["z"] == _morton_ref(r["ga"], r["gb"]), (r["ga"], r["gb"])


# ---------------------------------------------------- diff bucket checksum

@settings(max_examples=25, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10**6))
def test_diff_bucket_checksum_detects_any_single_change(spark, seed):
    """Soundness of the reconciliation checksum: perturbing ANY single
    row's content must change its bucket's (xor-checksum, count) pair —
    otherwise the drill-down would skip a genuinely dirty bucket."""
    from pyspark.sql import functions as F

    from hauser_spark.operators.diff import _bucket_summary, _with_row_hash

    rng = random.Random(seed)
    rows = [
        (i, rng.randint(0, 10**6), f"s{rng.randint(0, 99)}")
        for i in range(50)
    ]
    victim = rng.randrange(len(rows))
    changed = [
        (i, (v + 1) if i == victim else v, s) for i, v, s in rows
    ]
    cols = ["o_orderkey", "v", "s"]
    a = _bucket_summary(
        _with_row_hash(spark.createDataFrame(rows, cols))
    ).collect()
    b = _bucket_summary(
        _with_row_hash(spark.createDataFrame(changed, cols))
    ).collect()
    sa = {r["__bucket"]: (r["checksum"], r["n"]) for r in a}
    sb = {r["__bucket"]: (r["checksum"], r["n"]) for r in b}
    dirty = {k for k in sa if sa[k] != sb.get(k)}
    assert dirty == {rows[victim][0] % 256}, (dirty, victim)


# ------------------------------------------- histogram quantile sketch

@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=2,
        max_size=400,
    ),
    st.sampled_from([0.5, 0.9, 0.99]),
)
def test_histogram_quantile_within_one_bin_of_order_stat(values, p):
    """The equi-width histogram estimate lands inside the bin of the
    ⌈p·n⌉-th order statistic, so its error against that order stat is
    at most one bin width — the guarantee that makes the 256-int sketch
    state useful. (Against the CONTINUOUS interpolated quantile the gap
    can add one inter-order-stat spread, which is data- not
    sketch-bounded; the operator's oracle-checked abs_err column audits
    exactly that.)"""
    import math

    from hauser_spark.operators.sketches import HIST_BINS

    lo, hi = min(values), max(values)
    width = (hi - lo) / HIST_BINS
    if width == 0.0:
        return  # degenerate / sub-normal span: sketch is exact or N/A
    n = len(values)
    # sketch side: bin counts + linear interpolation (the oracle SQL)
    bins = [0] * HIST_BINS
    for v in values:
        bins[min(HIST_BINS - 1, int((v - lo) // width))] += 1
    target = p * n
    cum = 0
    for b, c in enumerate(bins):
        prev, cum = cum, cum + c
        if cum >= target and prev < target and c:
            est = lo + width * (b + (target - prev) / c)
            break
    k = min(n, max(1, math.ceil(target)))
    order_stat = sorted(values)[k - 1]
    tol = width + 1e-9 * max(abs(lo), abs(hi)) + 1e-12
    assert abs(est - order_stat) <= tol, (est, order_stat, width)
