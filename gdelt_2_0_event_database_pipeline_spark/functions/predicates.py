"""Predicate DSL → Catalyst ``Column`` (and ANSI SQL for the oracle).

Re-implements, Spark-first, the reference's JSON filter grammar
(grammar/validation: ``sampling/samplers.py:206-220``; condition dispatch:
``samplers.py:234-261``; nested AND/OR builder: ``samplers.py:263-297``; user
spec: ``filtered_sampling_guide.md``). Semantics preserved exactly
(SURVEY.md §2.11):

- ``{"Col": scalar}``           → equality (str/int/float/bool)
- ``{"Col": [v1, v2, ...]}``    → IN-list — a 2-element JSON array is IN,
                                  never a range
- ``{"Col": (lo, hi)}``         → inclusive range (Python-tuple internal API;
                                  unreachable from JSON)
- ``{"Col": {"op": ...}}``      → explicit operator dict: ``equals`` /
                                  ``in_list`` / ``gt`` / ``lt`` (strict) /
                                  ``between`` / ``range`` (both inclusive)
- ``"AND"`` / ``"OR"`` keys     → nested blocks; siblings inside a block join
                                  with the block's connective; top level = AND
- equality / IN on NULL never matches (three-valued logic — pyarrow and
  Spark/DuckDB agree)

The compile step is pure Python (no SparkSession needed) and emits a single
``pyspark.sql.Column`` expression tree; Catalyst then gets predicate pushdown,
partition pruning and codegen for free. ``compile_filter_sql`` emits the same
tree as an ANSI-SQL boolean expression so the DuckDB oracle can run the
identical predicate.
"""

from __future__ import annotations

from enum import Enum
from functools import reduce
from typing import Any, Collection, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

_BLOCK_KEYS = ("AND", "OR")


class FilterType(Enum):
    """Explicit-operator names (reference ``samplers.py:32-38``)."""

    EQUALS = "equals"
    IN_LIST = "in_list"
    RANGE = "range"
    GREATER_THAN = "gt"
    LESS_THAN = "lt"
    BETWEEN = "between"


# ---------------------------------------------------------------- validation
def validate_filter_dict(
    filter_dict: Mapping[str, Any], valid_columns: Collection[str] | None = None
) -> None:
    """Validate grammar (and, optionally, column names) before compiling.

    Mirrors ``samplers.py:206-220``: every non-block key must be a known
    column; AND/OR values must themselves be dicts.
    """

    def _validate(block: Any) -> None:
        if not isinstance(block, Mapping):
            raise ValueError("filter_dict must be dict/nested dicts")
        for key, val in block.items():
            if key in _BLOCK_KEYS:
                if not isinstance(val, Mapping):
                    raise ValueError(f"{key} must contain a dict")
                _validate(val)
            elif valid_columns is not None and key not in valid_columns:
                raise ValueError(f"Invalid filter column: {key}")

    _validate(filter_dict)


def filter_columns(filter_dict: Mapping[str, Any]) -> set[str]:
    """All column names referenced anywhere in the tree
    (reference ``samplers.py:223-231``)."""
    cols: set[str] = set()
    for key, val in filter_dict.items():
        if key in _BLOCK_KEYS:
            if isinstance(val, Mapping):
                cols |= filter_columns(val)
        else:
            cols.add(key)
    return cols


# ---------------------------------------------------------------- to Column
def _condition_to_column(column: str, cond: Any) -> Column:
    f = F.col(column)
    if isinstance(cond, bool) or isinstance(cond, (str, int, float)):
        return f == F.lit(cond)
    if isinstance(cond, list):
        return f.isin(cond)
    if isinstance(cond, tuple) and len(cond) == 2:
        lo, hi = cond
        return (f >= F.lit(lo)) & (f <= F.lit(hi))
    if isinstance(cond, Mapping):
        op = cond.get("op")
        if op == FilterType.EQUALS.value:
            return f == F.lit(cond["value"])
        if op == FilterType.IN_LIST.value:
            return f.isin(list(cond["values"]))
        if op == FilterType.GREATER_THAN.value:
            return f > F.lit(cond["value"])
        if op == FilterType.LESS_THAN.value:
            return f < F.lit(cond["value"])
        if op in (FilterType.RANGE.value, FilterType.BETWEEN.value):
            return (f >= F.lit(cond["min"])) & (f <= F.lit(cond["max"]))
    raise ValueError(f"Invalid condition for {column}: {cond!r}")


def compile_filter(filter_dict: Mapping[str, Any]) -> Column | None:
    """Compile the predicate tree to one ``Column`` (None if empty).

    Top-level connective is AND; an ``AND``/``OR`` key introduces a sub-block
    whose members join with that connective, and the sub-block result joins
    its siblings with the *parent's* connective (reference
    ``samplers.py:263-297``).
    """
    return _compile(filter_dict, "AND", _condition_to_column, _combine_col)


def _combine_col(join_with: str, parts: list[Column]) -> Column:
    op = Column.__and__ if join_with == "AND" else Column.__or__
    return reduce(op, parts)


def _compile(block, join_with, leaf_fn, combine_fn):
    if not block:
        return None
    parts = []
    for key, val in block.items():
        if key in _BLOCK_KEYS:
            sub = _compile(val, key, leaf_fn, combine_fn)
            if sub is None:
                continue
            parts.append(sub)
        else:
            parts.append(leaf_fn(key, val))
    if not parts:
        return None
    return combine_fn(join_with, parts)


# ---------------------------------------------------------------- to SQL
def _sql_literal(v: Any) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        escaped = v.replace("'", "''")
        return f"'{escaped}'"
    if v is None:
        return "NULL"
    return repr(v)


def _quote_ident(c: str) -> str:
    return '"' + c.replace('"', '""') + '"'


def _condition_to_sql(column: str, cond: Any) -> str:
    c = _quote_ident(column)
    if isinstance(cond, bool) or isinstance(cond, (str, int, float)):
        return f"{c} = {_sql_literal(cond)}"
    if isinstance(cond, list):
        vals = ", ".join(_sql_literal(v) for v in cond)
        return f"{c} IN ({vals})"
    if isinstance(cond, tuple) and len(cond) == 2:
        return f"{c} BETWEEN {_sql_literal(cond[0])} AND {_sql_literal(cond[1])}"
    if isinstance(cond, Mapping):
        op = cond.get("op")
        if op == FilterType.EQUALS.value:
            return f"{c} = {_sql_literal(cond['value'])}"
        if op == FilterType.IN_LIST.value:
            vals = ", ".join(_sql_literal(v) for v in cond["values"])
            return f"{c} IN ({vals})"
        if op == FilterType.GREATER_THAN.value:
            return f"{c} > {_sql_literal(cond['value'])}"
        if op == FilterType.LESS_THAN.value:
            return f"{c} < {_sql_literal(cond['value'])}"
        if op in (FilterType.RANGE.value, FilterType.BETWEEN.value):
            return f"{c} BETWEEN {_sql_literal(cond['min'])} AND {_sql_literal(cond['max'])}"
    raise ValueError(f"Invalid condition for {column}: {cond!r}")


def _combine_sql(join_with: str, parts: list[str]) -> str:
    if len(parts) == 1:
        return parts[0]
    return "(" + f" {join_with} ".join(parts) + ")"


def compile_filter_sql(filter_dict: Mapping[str, Any]) -> str:
    """Same tree as :func:`compile_filter`, rendered as an ANSI-SQL boolean
    expression (DuckDB- and Spark-SQL-compatible). Empty dict → ``TRUE``."""
    out = _compile(filter_dict, "AND", _condition_to_sql, _combine_sql)
    return out if out is not None else "TRUE"
