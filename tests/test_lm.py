"""Bigram LM cross-entropy scoring (operators/lm.py) — the CCNet-style
quality filter. Invariants: hand-computable probabilities on a tiny
corpus, the unseen-token smoothing floor, short-document dropout, and
train/score separation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gdelt_2_0_event_database_pipeline_spark.operators.lm import (
    bigram_lm_crossentropy,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_crossentropy(spark):
    # corpus: "a b" ×3 and "a c" ×1 → bigrams: (a,b)=3, (a,c)=1; c1(a)=4;
    # V = 3 (a, b, c); k=0.5
    df = _docs(
        spark,
        [(0, "a b"), (1, "a b"), (2, "a b"), (3, "a c")],
    )
    out = {r["doc_id"]: r for r in bigram_lm_crossentropy(df, k=0.5).collect()}
    p_ab = (3 + 0.5) / (4 + 0.5 * 3)
    p_ac = (1 + 0.5) / (4 + 0.5 * 3)
    assert out[0]["n_bigrams"] == 1
    assert out[0]["xent_bits"] == pytest.approx(-math.log2(p_ab), abs=1e-6)
    assert out[3]["xent_bits"] == pytest.approx(-math.log2(p_ac), abs=1e-6)
    # the rarer continuation costs more bits
    assert out[3]["xent_bits"] > out[0]["xent_bits"]


def test_short_documents_drop_out(spark):
    df = _docs(spark, [(0, "solo"), (1, ""), (2, "two words")])
    got = {r["doc_id"] for r in bigram_lm_crossentropy(df).collect()}
    assert got == {2}


def test_unseen_bigram_smoothing_floor(spark):
    # train LM on doc 0 only; score doc 1 whose bigram was never seen:
    # p = (0 + k) / (0 + k*V) = 1/V (unseen history) — finite, never -inf
    train = _docs(spark, [(0, "x y x y")])
    score = _docs(spark, [(1, "q r")])
    out = bigram_lm_crossentropy(score, train_df=train, k=0.5).collect()
    assert len(out) == 1
    v = 2  # train vocabulary: {x, y}
    assert out[0]["xent_bits"] == pytest.approx(math.log2(v), abs=1e-6)


def test_matches_duckdb_oracle_at_sf0001(spark):
    """Differential vs the registered oracle at the smallest SF (the
    driver repeats this at sf0.01)."""
    import duckdb

    from gdelt_2_0_event_database_pipeline_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (r["n_bigrams"], r["xent_bits"])
        for r in QUERIES["q_lm_score"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = {
        d: (n, x) for d, n, x in con.execute(QUERIES["q_lm_score"].sql).fetchall()
    }
    assert got == want and len(got) > 0
