"""Registry smoke: every declared query runs at sf0.001 and returns a stable
schema; entry() returns rows (the driver's t1 gate).

Also pins the events timestamp type matrix: round 3 shipped two driver ERRs
because ``test_temporal.py`` builds in-memory TimestampType frames while the
driver's parquet carried TIMESTAMP_NTZ — ``unix_micros`` rejects NTZ. The
``ts_flavor`` tests rewrite the sf0.001 events table in every physical
parquet timestamp encoding and run the unix_micros-dependent queries against
each, so testdata type drift fails locally before it fails at the driver.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as em
from tests.conftest import SF_DIR


def test_entry_returns_rows(spark):
    df = em.entry(spark)
    assert df.count() > 0


def test_oracle_sql_keys_subset_of_queries():
    qs, os_ = em.queries(), em.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40


@pytest.mark.parametrize("name", sorted(em.queries()))
def test_query_runs(spark, name):
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = em.queries()[name](spark, SF_DIR)
    assert df.columns  # non-empty schema
    # driver-canonicalizer contract (r14 verdict item 2): the harness
    # sorts/hashes result cells with pandas, which cannot handle list/
    # dict/struct cells — q_bpe_train ERR'd r14 on a top-level
    # array<string>. Complex outputs must be posexploded to long format
    # (q_sq_encode precedent) before being returned from queries().
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name} returns non-scalar top-level column(s) {bad}; the driver "
        "canonicalizer cannot sort/hash array/map/struct cells — "
        "posexplode to long format (q_sq_encode precedent)"
    )
    assert df.count() >= 0


# --------------------------------------------------------------------------
# events timestamp type matrix
# --------------------------------------------------------------------------
_TS_QUERIES = [
    "q_sessionize",
    "q_asof_nearest",
    "q_asof_join",
    "q_event_paths",
    "q_range_join",      # unix_timestamp path
    "q_events_hourly",   # date_trunc path
]
_TS_FLAVORS = ["us_utc", "us_ntz", "ns_ntz"]


@pytest.fixture(scope="session")
def events_ts_dirs(tmp_path_factory):
    """sf0.001 events rewritten in each physical parquet timestamp encoding:
    TIMESTAMP(MICROS, adjustedToUTC), TIMESTAMP(MICROS, no tz) → Spark NTZ,
    TIMESTAMP(NANOS) → Spark read fails without nanosAsLong."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_DIR}/events.parquet")
    ts = tbl.column("ts")
    base = ts.cast(pa.timestamp("us")) if ts.type != pa.timestamp("us") else ts
    idx = tbl.schema.get_field_index("ts")
    dirs = {}
    for flavor, typ in [
        ("us_utc", pa.timestamp("us", tz="UTC")),
        ("us_ntz", pa.timestamp("us")),
        ("ns_ntz", pa.timestamp("ns")),
    ]:
        d = tmp_path_factory.mktemp(f"events_{flavor}")
        out = tbl.set_column(idx, pa.field("ts", typ), base.cast(typ))
        pq.write_table(out, str(d / "events.parquet"))
        dirs[flavor] = str(d)
    return dirs


@pytest.mark.parametrize("flavor", _TS_FLAVORS)
@pytest.mark.parametrize("name", _TS_QUERIES)
def test_events_query_all_ts_flavors(spark, events_ts_dirs, name, flavor):
    df = em.queries()[name](spark, events_ts_dirs[flavor])
    assert df.count() > 0


def test_events_ts_normalized_to_timestamp(spark, events_ts_dirs):
    """_events must present TIMESTAMP regardless of the physical encoding."""
    from gdelt_2_0_event_database_pipeline_spark.plans.relational import _events

    for flavor, d in events_ts_dirs.items():
        dtype = dict(_events(spark, d).dtypes)["ts"]
        assert dtype == "timestamp", f"{flavor}: ts dtype {dtype}"
