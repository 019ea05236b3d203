"""Golden pipeline-parity tests for the YouGile mart build over raw-JSON
shaped fixtures (FIXTURES.md §B). Each assertion targets a reference
gotcha (SURVEY.md §2): explode_outer row keeping, null-keeping deleted
filter, conform-null sticker access, D1 orphan audit, F1–F6 scalar
semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from yougile_etl_pipeline_spark.plans.yougile import (
    YougileConfig,
    build_yougile_mart,
)
from yougile_etl_pipeline_spark.schemas import YOUGILE_SCHEMAS

LOADED = dt.datetime(2026, 1, 1)

CFG = YougileConfig(
    tracked_boards=["Main"],
    task_stickers={"contract_status": "stk_cs", "lot_status": "stk_ls"},
    subtask_stickers={
        "quantity_plan": "stk_qp", "quantity_fact": "stk_qf",
        "loading_dates1": "stk_ld1", "loading_dates2": "stk_ld2",
        "discharging_place1": "stk_dp1", "discharging_place2": "stk_dp2",
    },
    hub_names={"contract_status": "Статус сделки",
               "lot_status": "Статус лота"},
)

MS_DAY = 86_400_000
CREATED_MS = 1706745600000          # 2024-02-01T00:00:00Z
LATE_MS = 1706792400000             # 2024-02-01T13:00:00Z (same UTC day)


@pytest.fixture(scope="module")
def mart_and_audit(spark):
    mk = lambda rows, name: spark.createDataFrame(rows, YOUGILE_SCHEMAS[name])
    boards = mk([("B1", "Main", "P1"), ("B2", "Other", "P1")], "boards")
    columns = mk([("C1", "Todo", "B1"), ("C2", "Done", "B1"),
                  ("C3", "Other col", "B2")], "columns")
    stickers = mk([
        ("S1", "Статус сделки", [("st1", "Active"), ("st2", "Closed")]),
        ("S2", "Статус лота", []),          # empty states: R1 explode_outer
    ], "string_stickers")
    tasks = mk([
        # normal task, two subtasks (one will be deleted=true)
        ("T1", "Contract one", CREATED_MS, "C1", ["A", "B"],
         {"stk_cs": "st1"}),
        # no subtasks, no stickers map: must SURVIVE (R2 outer + P6)
        ("T2", "Contract two", LATE_MS, "C1", [], None),
        # subtask X never fetched: D1 orphan, row survives with null attrs
        ("T3", "Contract three", CREATED_MS, "C2", ["X"], {"stk_cs": "st2"}),
        # untracked board: hub join misses, row survives
        ("T4", "Contract four", CREATED_MS, "C3", None, None),
    ], "tasks")
    subtasks = mk([
        ("A", "Lot A", False,
         {"stk_qp": "5", "stk_qf": "", "stk_ld2": "01.02.2024 - 03.02.2024",
          "stk_dp1": "Riga"},
         (CREATED_MS, CREATED_MS + 2 * MS_DAY)),
        ("B", "Lot B", True, None, None),          # deleted → filtered (P6)
        ("C", "Lot C", None, None, None),          # unreferenced subtask
    ], "subtasks")
    mart, audit = build_yougile_mart(
        boards, columns, stickers, tasks, subtasks, CFG, LOADED)
    rows = {(r.task_id, r.subtask_id): r for r in mart.collect()}
    return mart, rows, audit.collect()[0]


def test_row_population(mart_and_audit):
    _, rows, _ = mart_and_audit
    # T1/B dropped (deleted=true); T2, T3/X, T4 survive.
    assert set(rows) == {("T1", "A"), ("T2", None), ("T3", "X"), ("T4", None)}


def test_normal_row_enrichment(mart_and_audit):
    _, rows, _ = mart_and_audit
    r = rows[("T1", "A")]
    assert (r.board_name, r.column_name) == ("Main", "Todo")
    assert r.contract_status == "Active"
    assert r.lot_status is None                      # sticker never carried
    assert r.quantity_plan == 5.0
    assert r.quantity_fact is None                   # '' → NULL → double (F6)
    assert r.loading_dates == "01.02.2024-03.02.2024"   # F2 strip + F1 coalesce
    assert r.loading_start_date == dt.date(2024, 2, 1)  # F3+F4
    assert r.loading_end_date == dt.date(2024, 2, 3)
    assert r.task_creation_date == dt.date(2024, 2, 1)  # F5 UTC floor
    assert r.deadline_end_date == dt.date(2024, 2, 3)
    assert r.discharging_place == "Riga"
    assert r.loaded_ts == LOADED                      # P9


def test_subtaskless_task_survives(mart_and_audit):
    _, rows, _ = mart_and_audit
    r = rows[("T2", None)]
    assert r.subtask_name is None and r.quantity_plan is None
    assert r.contract_status is None                 # absent stickers map
    assert r.task_creation_date == dt.date(2024, 2, 1)  # 13:00Z floors to day


def test_orphan_subtask_survives_and_audited(mart_and_audit):
    _, rows, audit = mart_and_audit
    r = rows[("T3", "X")]
    assert r.subtask_name is None
    assert r.contract_status == "Closed"
    assert audit.orphan_count == 1                   # D1: exactly X


def test_untracked_board_left_join_miss(mart_and_audit):
    _, rows, _ = mart_and_audit
    r = rows[("T4", None)]
    assert r.board_name is None and r.column_name is None
