"""Shared fixtures: one SparkSession per test session, plus the synthetic
GDELT event fixture from FIXTURES.md §2 (the reference's native table shape,
needed by reference-derived operators: predicate DSL, null-drop, samplers,
Hive partitioning)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gdelt_2_0_event_database_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
N_GDELT = 20_000


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s
    s.stop()


def make_gdelt_pdf(n: int = N_GDELT, seed: int = 7) -> pd.DataFrame:
    """Synthetic GDELT slice per FIXTURES.md §2: skewed QuadClass with an
    undersized stratum, NULLs in actor/geo/stratify columns, multi-year
    Day/MonthYear/Year, duplicated SOURCEURLs."""
    rng = np.random.default_rng(seed)
    years = rng.choice([2015, 2016, 2017], n, p=[0.2, 0.3, 0.5])
    months = rng.integers(1, 13, n)
    days = rng.integers(1, 29, n)
    day_int = years * 10000 + months * 100 + days
    quad = rng.choice([1, 2, 3, 4], n, p=[0.70, 0.20, 0.07, 0.03]).astype(float)
    quad[rng.random(n) < 0.02] = np.nan  # NA stratum
    countries = rng.choice(
        ["USA", "BRA", "CHN", "RUS", "FRA", "IND"], n, p=[0.4, 0.2, 0.15, 0.1, 0.1, 0.05]
    ).astype(object)
    countries[rng.random(n) < 0.05] = None
    actor1 = np.array([f"ACT{i % 50}" for i in range(n)], dtype=object)
    actor1[rng.random(n) < 0.1] = None
    lat = rng.uniform(-60, 60, n)
    lat[rng.random(n) < 0.1] = np.nan
    urls = np.array(
        [f"https://news.example.com/{rng.integers(0, n // 2)}" for _ in range(n)],
        dtype=object,
    )
    return pd.DataFrame(
        {
            "GlobalEventID": np.arange(1, n + 1, dtype=np.int64),
            "Day": day_int.astype(np.int64),
            "MonthYear": (years * 100 + months).astype(np.int64),
            "Year": years.astype(np.int64),
            "FractionDate": years + (months - 1) / 12.0,
            "Actor1Code": actor1,
            "Actor1CountryCode": countries,
            "IsRootEvent": rng.integers(0, 2, n).astype(np.int64),
            "EventCode": rng.choice(["010", "020", "042", "043", "190"], n),
            "QuadClass": quad,
            "GoldsteinScale": rng.uniform(-10, 10, n).round(1),
            "NumMentions": rng.integers(1, 100, n).astype(np.int64),
            "NumArticles": rng.integers(1, 50, n).astype(np.int64),
            "AvgTone": rng.uniform(-100, 100, n).round(2),
            "ActionGeo_CountryCode": countries.copy(),
            "ActionGeo_Lat": lat,
            "SOURCEURL": urls,
        }
    )


@pytest.fixture(scope="session")
def gdelt_path(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("gdelt") / "events.parquet"
    make_gdelt_pdf().to_parquet(path, index=False)
    return str(path)


@pytest.fixture(scope="session")
def gdelt_df(spark, gdelt_path):
    return spark.read.parquet(gdelt_path)
