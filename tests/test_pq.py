"""Planted-scenario tests for PQ-ADC: corpora where the encoding and the
reconstruction score are known by construction."""

from pyspark.sql import functions as F

import hauser_spark.operators.similarity as sim


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _planted(spark, monkeypatch):
    """Two well-separated label clusters in 8 dims; every vector sits
    exactly ON its label mean, so each subvector's nearest codeword is
    its own label's and ADC reconstruction is exact."""
    a = [1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0]
    b = [0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0]
    rows = [(i, a, 0) for i in range(3)] + [(10 + i, b, 1) for i in range(3)]
    # one query per cluster (vec_id < N_QUERIES are queries; 0 qualifies)
    emb = _emb(spark, rows)
    monkeypatch.setattr(sim, "load_table", lambda s, d, n: emb, raising=False)
    import hauser_spark.tables as tables

    monkeypatch.setattr(tables, "load_table", lambda s, d, n: emb)
    return emb


def test_pq_adc_exact_on_codebook_points(spark, monkeypatch):
    _planted(spark, monkeypatch)
    out = {
        (r.q_id, r.c_id): r for r in sim.pq_adc_topk(spark, "x").collect()
    }
    # query 0 (cluster a): same-cluster vectors reconstruct to cosine 1,
    # opposite cluster to cosine 0 — ADC is exact when vectors sit on
    # their codewords
    assert out[(0, 1)].adc_score == 1.0
    assert out[(0, 2)].adc_score == 1.0
    assert out[(0, 10)].adc_score == 0.0
    # ranking puts the same-cluster vectors first
    assert {out[(0, 1)].rank, out[(0, 2)].rank} == {1, 2}


def test_pq_codes_compress_to_m_ints(spark, monkeypatch):
    """The encode stage yields exactly PQ_M codes per vector."""
    _planted(spark, monkeypatch)
    emb = sim._load_embeddings(spark, "x").withColumn(
        "subd", (F.size("v") / sim.PQ_M).cast("int")
    )
    sub = emb.select(
        "vec_id", "label", "subd", F.posexplode("v").alias("pos", "x")
    ).select(
        "vec_id",
        "label",
        (F.col("pos") / F.col("subd")).cast("int").alias("m"),
        (F.col("pos") % F.col("subd")).alias("j"),
        "x",
    )
    per_vec = sub.groupBy("vec_id").agg(
        F.countDistinct("m").alias("n_sub")
    )
    assert all(r.n_sub == sim.PQ_M for r in per_vec.collect())
