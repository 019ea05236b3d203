"""Scalar functions F1–F7 (SURVEY.md §2.7) as Catalyst expressions.

Zero Python UDFs — every helper returns a Column compiled into whole-stage
codegen. Each cites the pandas statement it re-expresses.

Semantics notes (the correctness landmines):

* `parse_ddmmyyyy` (F4): pandas *raises* on malformed input
  (``dags/yougile_etl_dag.py:288-289``); under non-ANSI Spark we return
  NULL instead — permissive policy, paired with a quality counter in the
  pipeline (SURVEY.md §2.7 F4 gotcha).
* `epoch_ms_to_date` (F5): the reference floors epoch-ms in naive UTC
  (``pd.to_datetime(unit='ms').dt.floor('d')``, ``:290-292``) — correct
  only because the engine pins ``spark.sql.session.timeZone=UTC``
  (session.py).
* `split_range` (F3): pandas ``.str.split('-', expand=True)`` yields None
  for a missing second part (``:284``); Spark ``getItem`` out-of-range is
  NULL — matching for free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "coalesce_cols",
    "strip_spaces",
    "split_range",
    "parse_ddmmyyyy",
    "epoch_ms_to_date",
    "clean_numeric",
]


def coalesce_cols(*cols: Column | str) -> Column:
    """F1 — first non-null across columns; port of
    ``df[c1].fillna(df[c2])`` (``dags/yougile_etl_dag.py:230,233``)."""
    return F.coalesce(*[F.col(c) if isinstance(c, str) else c for c in cols])


def strip_spaces(col: Column | str) -> Column:
    """F2 — literal removal of spaces; port of ``.str.replace(' ', '')``
    (``dags/yougile_etl_dag.py:283``). Literal `replace`, not regex."""
    return F.replace(F.col(col) if isinstance(col, str) else col,
                     F.lit(" "), F.lit(""))


def split_range(col: Column | str, sep: str = "-") -> tuple[Column, Column]:
    """F3 — split into (start, end); end is NULL when absent
    (``dags/yougile_etl_dag.py:284``)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, sep)
    return parts.getItem(0), parts.getItem(1)


def parse_ddmmyyyy(col: Column | str) -> Column:
    """F4 — ``dd.MM.yyyy`` string → date, NULL on malformed (permissive;
    ``dags/yougile_etl_dag.py:288-289``)."""
    return F.to_date(F.col(col) if isinstance(col, str) else col, "dd.MM.yyyy")


def epoch_ms_to_date(col: Column | str) -> Column:
    """F5 — epoch-milliseconds → UTC-floored date
    (``dags/yougile_etl_dag.py:290-292``). Requires UTC session TZ."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(F.timestamp_millis(c.cast("long")))


def clean_numeric(col: Column | str) -> Column:
    """F6 — empty-string→NULL then cast to double; port of
    ``.replace('', None).astype(float)`` (``dags/yougile_etl_dag.py:294-295``).
    The explicit ``nullif`` documents intent (Spark's non-ANSI cast would
    NULL '' anyway)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit("")).cast("double")
