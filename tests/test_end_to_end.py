"""Full-pipeline integration: paginated REST (fake transport) → schema
conform → five-stage mart build → alert runner → partitioned snapshot
sink → latest-snapshot read. One test, the whole reference flow
(SURVEY.md §3.1), across two simulated hourly runs."""

from __future__ import annotations

import datetime as dt

from yougile_etl_pipeline_spark.plans.incremental import (
    append_snapshot,
    read_latest_snapshot,
)
from yougile_etl_pipeline_spark.plans.runner import run_with_alerts
from yougile_etl_pipeline_spark.plans.yougile import (
    YougileConfig,
    build_yougile_mart,
)
from yougile_etl_pipeline_spark.schemas import YOUGILE_SCHEMAS
from yougile_etl_pipeline_spark.sources.rest import fetch_entity
from yougile_etl_pipeline_spark.sources.sinks import AlertSink

CFG = YougileConfig(
    tracked_boards=["Main"],
    task_stickers={"contract_status": "stk_cs"},
    subtask_stickers={"quantity_plan": "stk_qp"},
    hub_names={"contract_status": "Статус сделки"},
)

# Entity payloads per simulated run: run 2 closes task T1's contract.
API_DATA = {
    1: {
        "boards": [{"id": "B1", "title": "Main", "projectId": "P1"}],
        "columns": [{"id": "C1", "title": "Todo", "boardId": "B1"}],
        "string-stickers": [
            {"id": "S1", "name": "Статус сделки",
             "states": [{"id": "st1", "name": "Active"},
                        {"id": "st2", "name": "Closed"}]}],
        "tasks": [{"id": "T1", "title": "Deal", "timestamp": 1706745600000,
                   "columnId": "C1", "subtasks": ["A"],
                   "stickers": {"stk_cs": "st1"}}],
        "subtasks": [{"id": "A", "title": "Lot A", "deleted": False,
                      "stickers": {"stk_qp": "5"},
                      "deadline": {"startDate": 1706745600000,
                                   "deadline": 1706918400000}}],
    },
}
API_DATA[2] = {**API_DATA[1],
               "tasks": [{**API_DATA[1]["tasks"][0],
                          "stickers": {"stk_cs": "st2"}}]}


def _api(run: int):
    def fetch(method, offset, limit, include_deleted, column_id):
        rows = API_DATA[run][method] if offset == 0 else []
        return {"content": rows, "paging": {"next": False}}
    return fetch


def test_rest_to_latest_snapshot(spark, tmp_path):
    alerts = AlertSink(lambda m: None)
    mart_path = str(tmp_path / "cdm_tasks")

    for run, ts in ((1, dt.datetime(2026, 1, 1, 5)),
                    (2, dt.datetime(2026, 1, 1, 6))):
        fetch = _api(run)
        land = str(tmp_path / f"landing_{run}")
        ent = {
            name: fetch_entity(spark, fetch, method,
                               YOUGILE_SCHEMAS[name], landing_dir=land)
            for name, method in [
                ("boards", "boards"), ("columns", "columns"),
                ("string_stickers", "string-stickers"),
                ("tasks", "tasks"), ("subtasks", "subtasks")]
        }
        run_with_alerts(
            lambda: build_yougile_mart(
                ent["boards"], ent["columns"], ent["string_stickers"],
                ent["tasks"], ent["subtasks"], CFG, ts),
            lambda df: append_snapshot(df, mart_path),
            alerts, run_ts=ts)

    assert alerts.sent == []                      # clean runs: no alerts
    latest = read_latest_snapshot(spark, mart_path)
    rows = latest.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.contract_status == "Closed"          # run 2 wins
    assert r.loaded_ts == dt.datetime(2026, 1, 1, 6)
    assert r.quantity_plan == 5.0 and r.board_name == "Main"
    # both snapshots still present in history (append-only, :280 semantics)
    assert spark.read.parquet(mart_path).count() == 2
