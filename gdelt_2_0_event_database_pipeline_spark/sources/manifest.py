"""Scrape-stage manifest: URL listing, filename-period parsing, date-range
pruning, idempotent downloads (SURVEY.md §2.1 S1–S4).

The reference drives a Selenium Chrome instance to list one static HTML page
(``scraping/scraper.py:37-122``) and loops downloads single-threaded
(``scraper.py:217-276``). Spark-first redesign: the listing is a driver-side
``requests`` + regex pass producing a *manifest DataFrame*; date pruning is a
filter on that manifest (ingest-time partition pruning — don't even download);
downloads fan out per-partition with the same atomic-rename + skip-existing
idempotency. No Selenium — the page is static.
"""

from __future__ import annotations

import calendar
import datetime as dt
import os
import re
from typing import Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Filename conventions (reference scraper.py:111-114, converter.py:43-45),
# widened to also match the extracted CSV names (``20150101.export.CSV``)
_DAILY = re.compile(r"^(\d{8})\.[^.].*$", re.IGNORECASE)
_MONTHLY = re.compile(r"^(\d{6})\.(?:zip|csv)$", re.IGNORECASE)
_YEARLY = re.compile(r"^(\d{4})\.(?:zip|csv)$", re.IGNORECASE)
_HREF = re.compile(r'href="([^"]+\.zip)"', re.IGNORECASE)


def classify_filename(filename: str) -> str | None:
    """'daily' | 'monthly' | 'yearly' | None (reference converter.py:98-105)."""
    name = os.path.basename(filename)
    if _DAILY.match(name):
        return "daily"
    if _MONTHLY.match(name):
        return "monthly"
    if _YEARLY.match(name):
        return "yearly"
    return None


def parse_file_date(filename: str) -> tuple[dt.date | None, dt.date | None]:
    """Filename → (period_start, period_end) (reference scraper.py:128-168).

    daily ``YYYYMMDD.export.CSV.zip`` → that day twice; monthly ``YYYYMM.zip``
    → first..last day of month; yearly ``YYYY.zip`` → Jan 1..Dec 31.
    Unparseable → (None, None).
    """
    name = os.path.basename(filename)
    m = _DAILY.match(name)
    if m:
        try:
            d = dt.datetime.strptime(m.group(1), "%Y%m%d").date()
        except ValueError:
            return (None, None)
        return (d, d)
    m = _MONTHLY.match(name)
    if m:
        year, month = int(m.group(1)[:4]), int(m.group(1)[4:])
        if not 1 <= month <= 12:
            return (None, None)
        last = calendar.monthrange(year, month)[1]
        return (dt.date(year, month, 1), dt.date(year, month, last))
    m = _YEARLY.match(name)
    if m:
        year = int(m.group(1))
        return (dt.date(year, 1, 1), dt.date(year, 12, 31))
    return (None, None)


def extract_zip_links(html: str, base_url: str = "") -> list[str]:
    """Harvest ``.zip`` hrefs from a directory-listing page (replaces the
    reference's Selenium pass, scraper.py:78-122)."""
    links = []
    for href in _HREF.findall(html):
        url = href if href.startswith("http") else base_url.rstrip("/") + "/" + href.lstrip("/")
        links.append(url)
    return links


def filter_urls_by_date(
    urls: Iterable[str],
    start: dt.date | None = None,
    end: dt.date | None = None,
) -> list[str]:
    """Keep URLs whose file period overlaps [start, end]; open bounds allowed;
    unparseable filenames are kept (reference scraper.py:171-211 semantics:
    only files with a known period are pruned)."""
    out = []
    for url in urls:
        fs, fe = parse_file_date(url.rsplit("/", 1)[-1])
        if fs is None:
            out.append(url)
            continue
        if start is not None and fe < start:
            continue
        if end is not None and fs > end:
            continue
        out.append(url)
    return out


def manifest_df(spark: SparkSession, urls: Sequence[str]) -> DataFrame:
    """URL manifest as a DataFrame: (url, filename, file_type, period_start,
    period_end). The distribution unit for fan-out downloads, and the thing
    date-pruning filters operate on declaratively."""
    rows = []
    for url in urls:
        name = url.rsplit("/", 1)[-1]
        fs, fe = parse_file_date(name)
        rows.append((url, name, classify_filename(name), fs, fe))
    return spark.createDataFrame(
        rows, "url string, filename string, file_type string, period_start date, period_end date"
    )


def prune_manifest(
    manifest: DataFrame, start: dt.date | None = None, end: dt.date | None = None
) -> DataFrame:
    """Declarative twin of :func:`filter_urls_by_date` on a manifest DataFrame."""
    cond = F.lit(True)
    known = F.col("period_start").isNotNull()
    if start is not None:
        cond = cond & (~known | (F.col("period_end") >= F.lit(start)))
    if end is not None:
        cond = cond & (~known | (F.col("period_start") <= F.lit(end)))
    return manifest.filter(cond)


# ---------------------------------------------------------------- download
def _default_fetcher(url: str, timeout: float) -> bytes:  # pragma: no cover
    import requests

    resp = requests.get(url, stream=True, timeout=timeout)
    resp.raise_for_status()
    return b"".join(resp.iter_content(chunk_size=8192))


def download_files(
    urls: Sequence[str],
    out_dir: str,
    retries: int = 3,
    timeout: float = 30.0,
    fetcher: Callable[[str, float], bytes] | None = None,
) -> dict[str, list[str]]:
    """Idempotent download loop (reference scraper.py:217-276 semantics):
    skip-if-exists, N retries, ``.tmp`` + atomic ``os.replace``. Returns
    {"success": [...], "skipped": [...], "failed": [...]}.

    ``fetcher`` is injectable for tests / air-gapped runs. For cluster-scale
    fan-out, call this from ``foreachPartition`` over :func:`manifest_df`
    with a shared filesystem or object-store sink.
    """
    fetch = fetcher or _default_fetcher
    os.makedirs(out_dir, exist_ok=True)
    result: dict[str, list[str]] = {"success": [], "skipped": [], "failed": []}
    for url in urls:
        name = url.rsplit("/", 1)[-1]
        dest = os.path.join(out_dir, name)
        if os.path.exists(dest):
            result["skipped"].append(name)
            continue
        ok = False
        for _ in range(max(retries, 1)):
            try:
                data = fetch(url, timeout)
                tmp = dest + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, dest)
                ok = True
                break
            except Exception:
                continue
        result["success" if ok else "failed"].append(name)
    return result
