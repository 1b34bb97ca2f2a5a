"""Running per-key top-k over an unbounded stream (SURVEY.md §2.9 extension
surface — the streaming twin of the batch ``q_topk_per_group`` window query,
with O(k) state per key instead of an unbounded shuffle).

Use case: "best k documents per source so far" / "top scoring domains per
crawl shard" maintained incrementally as new data lands.

Built on ``applyInPandasWithState``: state per key is exactly the k best
(score, item) pairs packed into two parallel arrays. Each micro-batch merges
its candidates into the state and re-emits the key's refreshed top-k tagged
with a per-key monotonically increasing ``version``, so downstream
append-only sinks select the newest snapshot per key with one max-version
filter. Determinism: duplicate items keep their best score; ties break on
item ascending.

``applyInPandasWithState`` is the CANONICAL custom-stateful-operator path
in this engine (SCALE.md "Streaming" stance): one state schema, one
Arrow-batched update function, exactly-once state semantics per key —
everything this operator needs. Spark 4's ``transformWithStateInPandas``
offers typed ListState/ValueState primitives as an alternative surface
for the same semantics; adopting it is an optional ergonomic migration,
not a dependency of any functionality here (tests/test_streaming_topk.py
pins this path's behavior directly).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOPK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("item", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

#: (items, scores, version) — the k best entries plus the snapshot counter
TOPK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("scores", T.ArrayType(T.DoubleType())),
        T.StructField("version", T.LongType()),
    ]
)


def _topk_fn(k: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        if state.exists:
            items, scores, version = state.get
            best = dict(zip(items, scores))
        else:
            best, version = {}, 0
        for pdf in pdfs:
            for item, score in zip(pdf["item"], pdf["score"]):
                if item is None or score is None or pd.isna(score):
                    continue
                s = float(score)
                if item not in best or s > best[item]:
                    best[item] = s
        ranked = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        version += 1
        state.update(
            ([i for i, _ in ranked], [s for _, s in ranked], version)
        )
        yield pd.DataFrame(
            {
                "key": [key_val] * len(ranked),
                "version": [version] * len(ranked),
                "rank": list(range(1, len(ranked) + 1)),
                "item": [i for i, _ in ranked],
                "score": [s for _, s in ranked],
            }
        )

    return fn


def streaming_topk(
    stream: DataFrame,
    key_col: str,
    item_col: str,
    score_col: str,
    k: int = 3,
) -> DataFrame:
    """Wire a (key, item, score) stream through the running top-k state
    machine. Output: one refreshed (key, version, rank, item, score)
    snapshot per key per micro-batch that touched the key."""
    from pyspark.sql import functions as F

    if k < 1:
        raise ValueError("k must be >= 1")
    prepared = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(item_col).cast("string").alias("item"),
        F.col(score_col).cast("double").alias("score"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _topk_fn(k),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
