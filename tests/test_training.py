"""Training-set assembly tests: chunk window semantics and reconstruction,
deterministic leakage-safe splits, linear packing offsets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdelt_2_0_event_database_pipeline_spark.operators.training import (
    assign_split,
    chunk_documents,
    pack_linear,
)


@pytest.fixture(scope="module")
def docs(spark):
    words = " ".join(f"w{i}" for i in range(23))
    return spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, "")], ["doc_id", "text"]
    )


def test_chunks_cover_and_overlap(docs):
    out = chunk_documents(docs, chunk_tokens=10, overlap=2).collect()
    d1 = sorted((r.chunk_start, r.n_tokens) for r in out if r.doc_id == 1)
    # 23 tokens, stride 8 -> starts 0,8,16; sizes 10,10,7
    assert d1 == [(0, 10), (8, 10), (16, 7)]
    first = next(r for r in out if r.doc_id == 1 and r.chunk_start == 8)
    assert first.chunk_text.split(" ")[0] == "w8"   # overlap window starts at stride
    # short and empty docs still yield exactly one chunk
    assert [(r.chunk_start, r.n_tokens) for r in out if r.doc_id == 2] == [(0, 3)]
    assert [(r.n_tokens, r.chunk_text) for r in out if r.doc_id == 3] == [(0, "")]


def test_chunks_reconstruct_without_overlap(docs):
    out = chunk_documents(docs, chunk_tokens=10, overlap=0).collect()
    parts = [r.chunk_text for r in sorted(
        (r for r in out if r.doc_id == 1), key=lambda r: r.chunk_start)]
    assert " ".join(p for p in parts if p) == " ".join(f"w{i}" for i in range(23))


def test_chunk_rejects_bad_overlap(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=10, overlap=10)


def test_split_is_deterministic_and_leakage_safe(spark):
    df = spark.createDataFrame(
        [(i, f"document number {i} body") for i in range(200)]
        + [(900, "document number 7 body")],  # exact dup of doc 7
        ["doc_id", "text"],
    )
    a = {r.doc_id: r.split for r in assign_split(df).collect()}
    b = {r.doc_id: r.split for r in assign_split(df.repartition(7)).collect()}
    assert a == b                      # partitioning-independent
    assert a[900] == a[7]              # duplicate content -> same split
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    assert counts["train"] > counts.get("val", 0)
    with pytest.raises(ValueError):
        assign_split(df, splits={"train": 0.5, "val": 0.2})


def test_pack_linear_offsets_and_boundaries(spark):
    df = spark.createDataFrame(
        [(i, "tok " * 100) for i in range(10)], ["doc_id", "text"]
    )
    out = pack_linear(df, "doc_id", budget=250).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].start_offset == 0 and by_id[0].pack_id == 0
    assert by_id[2].start_offset == 200 and by_id[2].pack_id == 0  # straddles
    assert by_id[3].start_offset == 300 and by_id[3].pack_id == 1
    # offsets are contiguous: each start = previous start + previous length
    starts = [by_id[i].start_offset for i in range(10)]
    assert starts == [i * 100 for i in range(10)]


def test_pack_linear_shards_are_independent(spark):
    df = spark.createDataFrame(
        [(i, "tok " * 10) for i in range(20)], ["doc_id", "text"]
    )
    out = pack_linear(df, "doc_id", shard_col=(F.col("doc_id") % 2), budget=50).collect()
    for r in out:
        assert r.shard in (0, 1)
    # each shard restarts offsets at 0
    for shard in (0, 1):
        rows = sorted((r for r in out if r.shard == shard), key=lambda r: r.doc_id)
        assert rows[0].start_offset == 0
        assert rows[1].start_offset == 10


def test_mix_sources_rates_and_determinism(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.training import mix_sources

    rows = [(i, f"document number {i} with some text payload", f"src{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    mixed = mix_sources(df, {"src0": 0.5, "src1": 0.0})
    counts = {r.source: r.n for r in mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "src1" not in counts                      # rate 0 drops the source
    assert counts["src2"] == counts["src3"] == 100   # default rate 1.0 keeps all
    assert 20 <= counts.get("src0", 0) <= 80         # ~half, fingerprint-bucketed

    # determinism: same subset on a different partitioning
    again = {
        r.doc_id
        for r in mix_sources(df.repartition(13), {"src0": 0.5, "src1": 0.0}).collect()
    }
    assert again == {r.doc_id for r in mixed.collect()}


def test_mix_sources_null_source_gets_default_rate(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.training import mix_sources

    df = spark.createDataFrame(
        [(1, "alpha text", None), (2, "beta text", "src0")],
        "doc_id long, text string, source string",
    )
    kept = {r.doc_id for r in mix_sources(df, {"src0": 0.0}).collect()}
    assert kept == {1}  # NULL source keeps default 1.0; src0 dropped


def test_mix_sources_rejects_bad_rate(spark):
    import pytest

    from gdelt_2_0_event_database_pipeline_spark.operators.training import mix_sources

    df = spark.createDataFrame([(1, "t", "s")], "doc_id long, text string, source string")
    with pytest.raises(ValueError, match="rate"):
        mix_sources(df, {"s": 1.5})


def test_pack_first_fit_invariants(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.training import (
        pack_first_fit,
        pack_linear,
    )

    rows = [
        (i, " ".join(f"w{j}" for j in range((i * 37) % 300 + 1)), i % 3)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, shard long")
    budget = 256
    out = pack_first_fit(df, shard_col="shard", budget=budget).collect()

    # completeness: every doc packed exactly once
    assert sorted(r.doc_id for r in out) == list(range(120))
    # capacity: no non-oversize bin exceeds budget
    loads: dict[tuple, int] = {}
    for r in out:
        assert not r.oversize or r.n_tokens > budget
        loads[(r.shard, r.pack_id)] = loads.get((r.shard, r.pack_id), 0) + r.n_tokens
    for (shard, pack), load in loads.items():
        members = [r for r in out if (r.shard, r.pack_id) == (shard, pack)]
        if not any(m.oversize for m in members):
            assert load <= budget, (shard, pack, load)

    # efficiency: per shard, bins ≥ n_oversize + ceil(rest/budget) (valid
    # lower bound — oversize docs sit alone; the rest is capacity-limited),
    # and FFD must land within 1.5× of it while beating one-doc-per-bin
    import math

    n_bins = len(loads)
    naive_bins = len(out)
    per_shard: dict[int, list[int]] = {}
    for r in out:
        per_shard.setdefault(r.shard, []).append(r.n_tokens)
    lower = sum(
        sum(1 for t in ts if t > budget)
        + math.ceil(sum(t for t in ts if t <= budget) / budget)
        for ts in per_shard.values()
    )
    assert lower <= n_bins < naive_bins
    assert n_bins <= 1.5 * lower + 3

    # determinism across partitionings
    again = {
        (r.doc_id, r.pack_id)
        for r in pack_first_fit(df.repartition(17), shard_col="shard", budget=budget).collect()
    }
    assert again == {(r.doc_id, r.pack_id) for r in out}


@pytest.mark.slow
def test_select_token_budget_matches_global_window(spark):
    """Bucketed cumulative selection must equal the naive global-window
    form, avoid single-task sorts, and be partitioning-independent."""
    from pyspark.sql import Window

    from gdelt_2_0_event_database_pipeline_spark.operators.training import (
        select_token_budget,
    )

    rows = [(i, float((i * 37) % 100), 10 + (i * 13) % 50) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, q double, nt long").repartition(8)
    budget = 3000

    got = select_token_budget(
        df, budget, score=F.col("q"), n_tokens_col="nt"
    )
    w = (
        Window.orderBy(F.col("q").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = (
        df.withColumn("cum_tokens", F.sum("nt").over(w))
        .filter(F.col("cum_tokens") <= budget)
    )
    got_rows = {(r.doc_id, r.cum_tokens) for r in got.collect()}
    want_rows = {(r.doc_id, r.cum_tokens) for r in want.collect()}
    assert got_rows == want_rows and got_rows

    # budget is a hard cap and the selection is the maximal prefix
    assert max(r.cum_tokens for r in got.collect()) <= budget

    # scale contract: no single-task global sort in the returned plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan

    again = {
        (r.doc_id, r.cum_tokens)
        for r in select_token_budget(
            df.repartition(3), budget, score=F.col("q"), n_tokens_col="nt"
        ).collect()
    }
    assert again == got_rows

    # known score bounds (even loose ones) skip the bounds job without
    # changing the selection — bounds shape buckets, never correctness
    lazy = {
        (r.doc_id, r.cum_tokens)
        for r in select_token_budget(
            df, budget, score=F.col("q"), n_tokens_col="nt",
            score_bounds=(-10.0, 200.0),
        ).collect()
    }
    assert lazy == got_rows


def test_select_token_budget_empty_input(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.training import (
        select_token_budget,
    )

    df = spark.createDataFrame([], "doc_id long, q double, nt long")
    out = select_token_budget(df, 100, score=F.col("q"), n_tokens_col="nt")
    assert out.count() == 0
    assert "cum_tokens" in out.columns


def test_pack_first_fit_matches_naive_linear_scan(spark):
    """Randomized differential: the segment-tree leftmost-fit must place
    every document in exactly the bin the naive O(bins) first-fit scan
    would (includes zero-token and oversize docs)."""
    import random

    from gdelt_2_0_event_database_pipeline_spark.operators.training import pack_first_fit

    rng = random.Random(11)
    rows = [(i, rng.randint(0, 600)) for i in range(500)]
    budget = 512
    df = spark.createDataFrame(rows, "doc_id long, nt long")
    got = {
        r.doc_id: r.pack_id
        for r in pack_first_fit(df, n_tokens_col="nt", budget=budget).collect()
    }

    loads: list[int] = []
    want: dict[int, int] = {}
    for i, n in sorted(rows, key=lambda t: (-t[1], t[0])):
        if n > budget:
            want[i] = len(loads)
            loads.append(n)
            continue
        for b, load in enumerate(loads):
            if load + n <= budget:
                loads[b] = load + n
                want[i] = b
                break
        else:
            want[i] = len(loads)
            loads.append(n)
    assert got == want


def test_pack_first_fit_oversize_singleton(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.training import pack_first_fit

    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 600)), (2, "a b c"), (3, "d e")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pack_first_fit(df, budget=512).collect()}
    assert out[1].oversize and out[1].n_tokens == 600
    # the oversize doc sits alone in its bin
    assert {r.pack_id for r in out.values() if r.doc_id != 1} != {out[1].pack_id}
    assert not out[2].oversize and not out[3].oversize


def test_select_token_budget_per_group_caps_each_group(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.training import (
        select_token_budget_per_group,
    )

    rows = [
        (i, ["en", "fr", "de"][i % 3], float((i * 31) % 50), 20 + (i * 7) % 30)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, q double, nt long")
    out = select_token_budget_per_group(
        df, 500, "lang", score=F.col("q"), n_tokens_col="nt"
    ).collect()

    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == {"en", "fr", "de"}
    for lang, rs in by_lang.items():
        assert max(r.cum_tokens for r in rs) <= 500
        assert sum(r.n_tokens for r in rs) == max(r.cum_tokens for r in rs)
        # the selection is each group's best-score prefix: every kept row's
        # score is >= every dropped row's score (modulo the id tiebreak)
        kept_ids = {r.doc_id for r in rs}
        kept_min_q = min(float(row[2]) for row in rows if row[0] in kept_ids)
        dropped_max_q = max(
            (float(row[2]) for row in rows
             if row[1] == lang and row[0] not in kept_ids),
            default=float("-inf"),
        )
        assert kept_min_q >= dropped_max_q - 1e-9 or dropped_max_q == float("-inf")


# ---------------------------------------------------------------------------
# Exact-parity class balancing
# ---------------------------------------------------------------------------


def test_class_balance_exact_parity(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.training import class_balance

    rows = [(i, "big") for i in range(10)] + [(100 + i, "small") for i in range(3)] + [
        (200, "tiny")
    ]
    df = spark.createDataFrame(rows, "doc_id long, cls string")
    out = class_balance(df, "cls", "doc_id")
    per_class = {r.cls: r.n for r in out.groupBy("cls").count().withColumnRenamed("count", "n").collect()}
    assert per_class == {"big": 10, "small": 10, "tiny": 10}
    # majority rows appear exactly once
    assert out.filter("cls = 'big'").groupBy("doc_id").count().filter("count > 1").count() == 0
    # extra copies go to the LOWEST doc_ids: small has 10 = 3*3 + 1 extra on id 100
    small = {r.doc_id: r.n for r in out.filter("cls='small'").groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    assert small == {100: 4, 101: 3, 102: 3}
    # copy_idx enumerates 1..copies per source row
    idx = sorted(r.copy_idx for r in out.filter("doc_id = 100").collect())
    assert idx == [1, 2, 3, 4]


def test_class_balance_single_class_noop(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.training import class_balance

    df = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, cls string")
    out = class_balance(df, "cls", "doc_id")
    assert out.count() == 2 and out.filter("copy_idx <> 1").count() == 0


def test_shuffle_shard_assign_is_deterministic_and_loader_shaped(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.training import (
        shuffle_shard_assign,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    a = shuffle_shard_assign(docs, ["doc_id"], shards=4, seed=42)
    got = {r.doc_id: (r.shard, r.pos) for r in a.collect()}
    assert len(got) == n
    # partitioning-independence: same addresses on a different layout
    b = shuffle_shard_assign(docs.repartition(13), ["doc_id"], shards=4, seed=42)
    assert {r.doc_id: (r.shard, r.pos) for r in b.collect()} == got
    # loader shape: per shard, pos is exactly 1..len(shard)
    per = {}
    for shard, pos in got.values():
        per.setdefault(shard, []).append(pos)
    assert set(per) == {0, 1, 2, 3}
    for shard, ps in per.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # rough uniformity: no shard holds more than half the corpus
    assert max(len(p) for p in per.values()) < 0.5 * n
    # epoch reshuffle: a new seed produces a different permutation
    c = {r.doc_id: (r.shard, r.pos)
         for r in shuffle_shard_assign(docs, ["doc_id"], shards=4, seed=7).collect()}
    assert c != got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shards"):
        shuffle_shard_assign(docs, ["doc_id"], shards=0)
    with _pytest.raises(ValueError, match="key_cols"):
        shuffle_shard_assign(docs, [], shards=4)


def test_temperature_mix_weights_invariants(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.training import (
        temperature_mix_weights,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = {r["group"]: r for r in temperature_mix_weights(d, "lang", 0.3).collect()}
    assert abs(sum(r["weight"] for r in w.values()) - 1.0) < 1e-9
    assert abs(sum(r["share"] for r in w.values()) - 1.0) < 1e-9
    # alpha=1 reproduces the raw shares exactly
    w1 = {r["group"]: r for r in temperature_mix_weights(d, "lang", 1.0).collect()}
    for g, r in w1.items():
        assert abs(r["weight"] - r["share"]) < 1e-12
    # temperature flattens: the head language's weight shrinks vs its
    # share, a tail language's grows
    head = max(w.values(), key=lambda r: r["share"])
    tail = min(w.values(), key=lambda r: r["share"])
    assert head["weight"] < head["share"]
    assert tail["weight"] > tail["share"]
    import pytest as _pt

    with _pt.raises(ValueError):
        temperature_mix_weights(d, "lang", 0.0)


def test_dsir_importance_separates_target(spark):
    """Documents from the target slice must score higher on average than
    the rest (the operator's whole point), and a tokenless document
    scores exactly 0.0."""
    from pyspark.sql import functions as F

    from gdelt_2_0_event_database_pipeline_spark.operators.training import (
        dsir_importance,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    blank = spark.createDataFrame(
        [(999_999, "", "en", "srcX", 0)], d.schema
    )
    corpus = d.unionByName(blank)
    scores = dsir_importance(corpus, corpus.filter(F.col("lang") == "en"))
    joined = {r["doc_id"]: r["score"] for r in scores.collect()}
    assert joined[999_999] == 0.0
    langs = {r["doc_id"]: r["lang"] for r in d.select("doc_id", "lang").collect()}
    en = [s for i, s in joined.items() if langs.get(i) == "en"]
    other = [s for i, s in joined.items() if i in langs and langs[i] != "en"]
    assert sum(en) / len(en) > sum(other) / len(other)
