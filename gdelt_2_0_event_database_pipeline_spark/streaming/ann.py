"""Streaming ANN index maintenance — the ingest half of the PQ family.

``operators/pq.py:append_pq_index`` made index maintenance a batch
operation (encode against the persisted codebooks, partition-scoped
upsert into ``<index>/codes``); this module wires it behind
``foreachBatch`` so a document stream keeps the index current as files
land — the full path from the reference's 15-minute drop cadence to a
searchable compressed index with no rebuild.

Exactly-once WITHOUT a ledger: unlike the additive rollup state
(``streaming/rollup.py``, where a replayed ``+=`` double-counts and a
batch-id ledger is required), the upsert is IDEMPOTENT — ``pq_encode``
is a deterministic map-side expression of the frozen codebooks, so a
replayed batch re-encodes to the SAME codes and replaces the same keys
with the same rows. At-least-once delivery therefore converges to the
exactly-once state by construction; pinned in tests/test_streaming_ann.py.

Codebook drift: the quantizers are frozen at index creation (the
standard FAISS-style discipline — retrain on evidence, not per batch).
``operators/pq.index_drift_report`` is the evidence: run it on the
recent batches any time (occupancy TVD vs the build snapshot + a
frozen-vs-refit error ratio, both bounded-cost) and refit + rebuild
when it recommends — thresholds measured in DRIFT_PROBE.json.

Residual indexes maintain identically: ``append_pq_index`` reads the
``residual`` flag from the index meta and encodes the batch with the
matching math, so the idempotence argument is unchanged (pinned in
tests/test_streaming_ann.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.pq import append_pq_index


def maintain_pq_index_stream(
    stream: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str = "ingest_day",
):
    """``writeStream.foreachBatch`` wrapper around
    :func:`operators.pq.append_pq_index` — returns the started query
    handle. ``stream`` must carry (id_col, vec_col, partition_col); the
    index at ``index_path`` must exist (``write_pq_index`` with the
    same ``partition_col``). Search the maintained index any time with
    ``read_pq_index`` + ``pq_topk``, or — for an IVF-PQ index (persisted
    centroids; appends assign cells automatically) —
    ``ivf_pq_search_index``, which never re-assigns the corpus."""

    def _append(batch: DataFrame, _batch_id: int) -> None:
        append_pq_index(
            batch.sparkSession,
            index_path,
            batch,
            id_col=id_col,
            vec_col=vec_col,
            partition_col=partition_col,
        )

    return (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
