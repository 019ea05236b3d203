"""Job runner: failure notification + soft data-quality alerts (D1/D4).

Reference behavior reproduced exactly (SURVEY.md §3.2): a hard failure
fires the alert AND propagates (Airflow ``on_failure_callback``,
``dags/yougile_etl_dag.py:34-38,342``); the D1 lost-data audit alerts but
does NOT fail the run — the rows still load (``:241-244``).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame

from yougile_etl_pipeline_spark.sources.sinks import AlertSink

__all__ = ["run_with_alerts"]


def run_with_alerts(
    job: Callable[[], tuple[DataFrame, DataFrame]],
    write: Callable[[DataFrame], None],
    alerts: AlertSink,
    *,
    job_name: str = "yougile-mart",
    run_ts: dt.datetime | None = None,
) -> DataFrame | None:
    """Execute `job() -> (mart, audit)`, write the mart, alert on problems.

    * job raises → alert + re-raise (D4, hard failure path).
    * audit.orphan_count > 0 → alert, keep going (D1, soft failure — the
      reference loads the rows anyway).
    Returns the mart DataFrame on success.
    """
    stamp = f" [{run_ts.isoformat()}]" if run_ts else ""
    try:
        mart, audit = job()
        orphans = audit.collect()[0]["orphan_count"] or 0
        if orphans > 0:
            alerts.alert(
                f"{job_name}{stamp}: {orphans} child rows failed to "
                f"download (orphan foreign keys) — loading anyway")
        write(mart)
        return mart
    except Exception as e:  # noqa: BLE001 — alert then propagate, D4
        alerts.alert(f"{job_name}{stamp} FAILED: {type(e).__name__}: {e}")
        raise
