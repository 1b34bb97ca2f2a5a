"""Persisted MinHash signature index: build/append == one-shot build,
signature-estimated Jaccard matches an independent python replay, and the
crawl-dedup decision drops exactly the matched rows — all without the
reference text ever being stored or re-read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdelt_2_0_event_database_pipeline_spark.operators.dedup import (
    append_minhash_index,
    dedup_against_minhash_index,
    minhash_match_index,
    read_minhash_index_meta,
    write_minhash_index,
)

BASE = "the quick brown fox jumps over the lazy dog and runs far away today"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def ref(spark):
    # 0/1 near-identical, 2 distinct, 3 another distinct
    return _docs(
        spark,
        [
            (0, BASE),
            (1, BASE + " extra"),
            (2, "completely different content about spark shuffles and joins"),
            (3, "yet another unrelated document mentioning parquet footers"),
        ],
    )


def test_build_match_and_estimates(spark, tmp_path, ref):
    path = str(tmp_path / "idx")
    write_minhash_index(ref, path)
    meta = read_minhash_index_meta(spark, path)
    assert meta == {
        "num_hashes": 64, "bands": 16, "shingle_n": 3, "hash_family": "xxhash64"
    }
    batch = _docs(
        spark,
        [
            (100, BASE),  # exact copy of ref 0 -> est 1.0
            (101, BASE + " extra"),  # exact copy of ref 1
            (102, "no overlap here at all zzzz qqqq"),
        ],
    )
    got = {
        (r.id, r.ref_id): r.est_jaccard
        for r in minhash_match_index(spark, path, batch, threshold=0.5).collect()
    }
    assert got[(100, 0)] == 1.0 and got[(101, 1)] == 1.0
    # near-identical cross pairs match with a high estimate (the affine
    # h_i = b1 + i*b2 family correlates positions, so a tiny text delta
    # can leave all k minima unchanged — est may round all the way to 1)
    assert 0.5 <= got[(100, 1)] <= 1.0 and got[(100, 1)] == got[(101, 0)]
    assert all(rid in (0, 1) for (_, rid) in got)  # no junk matches
    assert not any(i == 102 for (i, _) in got)


def test_append_equals_one_shot_build(spark, tmp_path, ref):
    one = str(tmp_path / "one")
    inc = str(tmp_path / "inc")
    write_minhash_index(ref.withColumn("ingest_day", F.lit("d0")), one,
                        partition_col="ingest_day")
    write_minhash_index(
        ref.filter("doc_id < 2").withColumn("ingest_day", F.lit("d0")),
        inc,
        partition_col="ingest_day",
    )
    append_minhash_index(
        spark, inc, ref.filter("doc_id >= 2").withColumn("ingest_day", F.lit("d1"))
    )
    batch = _docs(spark, [(100, BASE), (102, "unrelated document mentioning parquet")])

    def canon(path):
        return sorted(
            map(tuple, minhash_match_index(spark, path, batch, threshold=0.3).collect())
        )

    assert canon(inc) == canon(one) and canon(one)
    # state parity, not just query parity
    for tab in ("sigs", "bands"):
        a = sorted(map(tuple, spark.read.parquet(f"{one}/{tab}").drop("ingest_day").collect()))
        b = sorted(map(tuple, spark.read.parquet(f"{inc}/{tab}").drop("ingest_day").collect()))
        assert a == b, tab


def test_reingest_replaces_signature(spark, tmp_path, ref):
    path = str(tmp_path / "idx")
    write_minhash_index(
        ref.withColumn("ingest_day", F.lit("d0")), path, partition_col="ingest_day"
    )
    # doc 3 re-ingested with doc 0's text, same partition
    append_minhash_index(
        spark,
        path,
        _docs(spark, [(3, BASE)]).withColumn("ingest_day", F.lit("d0")),
    )
    sigs = spark.read.parquet(f"{path}/sigs")
    assert sigs.filter("ref_id = 3").count() == 1
    s0 = sigs.filter("ref_id = 0").first().sig
    s3 = sigs.filter("ref_id = 3").first().sig
    assert list(s0) == list(s3)
    assert spark.read.parquet(f"{path}/bands").filter("ref_id = 3").count() == 16


def test_dedup_against_index_drops_matches_only(spark, tmp_path, ref):
    path = str(tmp_path / "idx")
    write_minhash_index(ref, path)
    batch = _docs(spark, [(100, BASE), (101, "fresh novel content xyz")])
    kept = dedup_against_minhash_index(spark, path, batch, threshold=0.7)
    assert [r.doc_id for r in kept.collect()] == [101]


def test_bad_params_rejected(spark, tmp_path, ref):
    with pytest.raises(ValueError):
        write_minhash_index(ref, str(tmp_path / "x"), bands=7)  # 7 ∤ 64
    path = str(tmp_path / "idx")
    write_minhash_index(ref, path)
    with pytest.raises(ValueError):
        append_minhash_index(spark, path, ref)  # no ingest_day column


def test_estimator_tracks_exact_jaccard_on_fixture(spark, tmp_path):
    """On the real documents fixture, the signature-estimated Jaccard of
    matched pairs must track exact shingle Jaccard within the k-sample
    estimator's error budget (k=64 -> sigma = sqrt(J(1-J)/64) <= 0.0625;
    assert mean |est - exact| < 2*sigma_max and a generous max bound).
    This is the quantitative form of the 'signatures instead of text'
    trade documented on minhash_match_index."""
    from gdelt_2_0_event_database_pipeline_spark.operators.dedup import jaccard
    from gdelt_2_0_event_database_pipeline_spark.operators.text import char_ngrams

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref = d.filter("doc_id >= 150 AND doc_id < 300")
    new = d.filter("doc_id < 150")
    path = str(tmp_path / "idx")
    write_minhash_index(ref, path)
    pairs = minhash_match_index(spark, path, new, threshold=0.3)

    sh = d.select("doc_id", F.array_distinct(char_ngrams(F.col("text"), 3)).alias("sh"))
    joined = (
        pairs.join(sh.select(F.col("doc_id").alias("id"), F.col("sh").alias("sa")), "id")
        .join(sh.select(F.col("doc_id").alias("ref_id"), F.col("sh").alias("sb")), "ref_id")
        .withColumn("exact", jaccard(F.col("sa"), F.col("sb")))
        .select("est_jaccard", "exact")
    )
    rows = joined.collect()
    assert len(rows) > 50  # the fixture has real near-dup structure
    errs = [abs(r.est_jaccard - r.exact) for r in rows]
    assert sum(errs) / len(errs) < 0.125
    assert max(errs) < 0.4


def test_meta_null_fields_raise_value_error(spark, tmp_path, ref):
    """A partially-written meta row (null fields) must raise the intended
    ValueError naming the path, not a TypeError from '%' on NoneType; an
    unknown hash_family is rejected too (r10 advice, low)."""
    import json
    import os

    path = str(tmp_path / "idx")
    write_minhash_index(ref, path)
    meta_dir = f"{path}/meta"
    part = [f for f in os.listdir(meta_dir) if f.endswith(".json")][0]
    with open(os.path.join(meta_dir, part)) as fh:
        row = json.loads(fh.read())

    def _rewrite(d):
        with open(os.path.join(meta_dir, part), "w") as fh:
            fh.write(json.dumps(d))
        crc = os.path.join(meta_dir, f".{part}.crc")
        if os.path.exists(crc):
            os.remove(crc)  # stale checksum would mask the edit

    broken = dict(row)
    del broken["bands"]
    _rewrite(broken)
    with pytest.raises(ValueError, match="null/missing"):
        read_minhash_index_meta(spark, path)

    bad_family = dict(row)
    bad_family["hash_family"] = "sha1"
    _rewrite(bad_family)
    with pytest.raises(ValueError, match="hash_family"):
        read_minhash_index_meta(spark, path)



def test_expr_spelling_matches_column_spelling(spark, ref):
    """r16: the signature/band expression trees are built as F.expr SQL
    strings (construction cost — guide §4 py4j round-trips); this pins the
    parsed trees to the original chained-Column spelling byte-for-byte, for
    BOTH hash families, across all three kernels (banding sig frame, band
    buckets, independent estimator family)."""
    from gdelt_2_0_event_database_pipeline_spark.operators.dedup import (
        _bands_from_sig,
        _independent_minhash_sig,
        _minhash_sig_frame,
    )
    from gdelt_2_0_event_database_pipeline_spark.operators.text import char_ngrams

    def col_sig_frame(df, num_hashes, shingle_n, hash_family):
        if hash_family == "md5":
            _m = F.md5(F.col("__s__"))
            b1 = F.conv(F.substring(_m, 1, 10), 16, 10).cast("long")
            b2 = F.conv(F.substring(_m, 11, 10), 16, 10).cast("long")
        else:
            b1 = F.shiftrightunsigned(F.xxhash64(F.col("__s__"), F.lit(0)), 24)
            b2 = F.shiftrightunsigned(F.xxhash64(F.col("__s__"), F.lit(1)), 24)
        exploded = df.select(
            F.col("doc_id").alias("__id__"),
            F.explode(F.array_distinct(char_ngrams(F.col("text"), shingle_n))).alias("__s__"),
        ).select("__id__", b1.alias("__b1__"), b2.alias("__b2__"))
        return exploded.groupBy("__id__").agg(
            *[
                F.min(F.col("__b1__") + F.lit(i) * F.col("__b2__")).alias(f"__h{i}__")
                for i in range(num_hashes)
            ]
        )

    def col_bands(sig, num_hashes, bands, hash_family):
        rpb = num_hashes // bands

        def bucket(b):
            joined = F.concat_ws(
                ",", *[F.col(f"__h{b * rpb + j}__").cast("string") for j in range(rpb)]
            )
            if hash_family == "md5":
                return F.md5(F.concat_ws(",", joined, F.lit(str(b))))
            return F.xxhash64(joined, F.lit(b))

        structs = [
            F.struct(F.lit(b).alias("band"), bucket(b).alias("bucket"))
            for b in range(bands)
        ]
        return sig.select(
            "__id__", F.explode(F.array(*structs)).alias("__b__")
        ).select(
            "__id__",
            F.col("__b__.band").alias("band"),
            F.col("__b__.bucket").alias("bucket"),
        )

    def col_indep(df, num_hashes, shingle_n, hash_family):
        exploded = df.select(
            F.col("doc_id").alias("__id__"),
            F.explode(F.array_distinct(char_ngrams(F.col("text"), shingle_n))).alias("__s__"),
        )
        if hash_family == "md5":
            def h(i):
                return F.conv(
                    F.substring(F.md5(F.concat(F.col("__s__"), F.lit(f"|{i}"))), 1, 15),
                    16, 10,
                ).cast("long")
        else:
            def h(i):
                return F.xxhash64(F.col("__s__"), F.lit(i))
        agg = exploded.groupBy("__id__").agg(
            *[F.min(h(i)).alias(f"__m{i}__") for i in range(num_hashes)]
        )
        return agg.select(
            "__id__",
            F.array(*[F.col(f"__m{i}__") for i in range(num_hashes)]).alias("sig"),
        )

    for fam in ("md5", "xxhash64"):
        old_sig = col_sig_frame(ref, 16, 3, fam)
        new_sig = _minhash_sig_frame(ref, "doc_id", "text", 16, 3, fam)
        assert sorted(map(str, old_sig.collect())) == sorted(map(str, new_sig.collect()))
        assert sorted(map(str, col_bands(old_sig, 16, 4, fam).collect())) == sorted(
            map(str, _bands_from_sig(new_sig, 16, 4, fam).collect())
        )
        assert sorted(
            map(str, col_indep(ref, 16, 3, fam).collect())
        ) == sorted(
            map(str, _independent_minhash_sig(ref, "doc_id", "text", 16, 3, fam).collect())
        )
