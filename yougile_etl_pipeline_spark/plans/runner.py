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

__all__ = ["run_with_alerts", "observe_expectations"]


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


def observe_expectations(df: DataFrame, rules: dict,
                         *, name: str = "quality"):
    """Attach in-flight data-quality metrics to a DataFrame: total rows
    plus one violation count per expectation rule, collected DURING the
    next action by Spark's Observation API — zero extra scans, zero
    shuffles, exact counts (unlike accumulators, observed metrics are
    not double-counted on task retry).

    This is the production shape for "emit DQ metrics with every load":
    at 100 TB a separate metrics pass would re-read the table; observe()
    rides the write. Returns ``(observed_df, observation)`` — run the
    action, then read ``observation.get``.

    The rule predicates are the same Column expressions
    `operators/quality.py::check_expectations` takes, so the gate and
    the metrics can share one rule dict."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for rname, cond in rules.items():
        metrics.append(
            F.sum((~cond.eqNullSafe(F.lit(True))).cast("long"))
             .alias(f"violations_{rname}"))
    return df.observe(obs, *metrics), obs
