"""YAML settings loader (reference ``utils/config.py:6-14`` — same config
shape: ``columns.gdelt_event``, ``columns_numeric``, ``paths``,
``partitioning``, ``scraping``, ``filtering``), with defaults from the
declared schema when keys are absent."""

from __future__ import annotations

from typing import Any

import yaml

from .schema import DEFAULT_PARTITION_RULES, GDELT_COLUMNS, NUMERIC_COLUMNS


def load_config(path: str | None = None) -> dict[str, Any]:
    cfg: dict[str, Any] = {}
    if path:
        with open(path) as f:
            cfg = yaml.safe_load(f) or {}
    cfg.setdefault("columns", {}).setdefault("gdelt_event", list(GDELT_COLUMNS))
    cfg.setdefault("columns_numeric", sorted(NUMERIC_COLUMNS))
    cfg.setdefault("paths", {})
    part = cfg.setdefault("partitioning", {})
    part.setdefault("enabled", True)
    part.setdefault("rules", dict(DEFAULT_PARTITION_RULES))
    cfg.setdefault("filtering", {}).setdefault("columns", [])
    return cfg
