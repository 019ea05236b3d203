"""Unit + plan-shape tests for the round-13 operator additions, on
hand-computable fixtures (the oracle sweeps certify corpus-scale
values; these pin SEMANTICS the synthetic tables cannot isolate).

* events_survival_km: hand-checked KM arithmetic with censoring —
  the censored user must inflate at_risk without ever dying.
* events_max_drawdown: a crafted up-down-up trajectory where the
  answer is visible by eye, plus the single-shuffle plan claim.
* quality_mann_whitney_gate: tie handling — doubled average ranks on
  a corpus that is ALL ties must yield U = n1·n2 exactly (each pair
  contributes ½) and a zero z (variance guard, not NaN).
* wav_trim_stats: all-quiet payload survives with the -1/-1/0/0 row.
* quality_tv_drift_gate: a constructed half-swap mix has a
  hand-computable TV distance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from yougile_etl_pipeline_spark.operators.diagnostics import plan_profile


def _events(spark, rows):
    # rows: (event_id, user_id, ms, event_type, value)
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "user_id", "ms", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf.pop("ms"), unit="ms")
    pdf["props"] = "{}"
    return spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value",
             "props"]])


def test_survival_km_hand_example(spark, monkeypatch):
    """3 users: A converts at hour 0, B at hour 2, C never (censored
    at the 48h horizon). KM: S(0) = (3-1)/3, S(2) = S(0)·(2-1)/2 —
    the censored user C stays in BOTH risk sets."""
    from yougile_etl_pipeline_spark import registry_r13
    from yougile_etl_pipeline_spark.registry import QUERIES

    H = 3_600_000
    ev = _events(spark, [
        (0, 1, 0 * H, "view", 1.0), (1, 1, 0 * H, "purchase", 1.0),
        (2, 2, 0 * H, "view", 1.0), (3, 2, 2 * H, "purchase", 1.0),
        (4, 3, 0 * H, "view", 1.0), (5, 3, 60 * H, "view", 1.0),
    ])
    monkeypatch.setattr(registry_r13, "load_table",
                        lambda spark, sf, name: ev)
    rows = {r["dur"]: r for r in
            QUERIES["events_survival_km"](spark, "ignored").collect()}
    assert set(rows) == {0, 2}
    assert rows[0]["deaths"] == 1 and rows[0]["at_risk"] == 3
    assert rows[0]["survival_fp"] == 1_000_000_000 * 2 // 3
    assert rows[2]["deaths"] == 1 and rows[2]["at_risk"] == 2
    assert rows[2]["survival_fp"] == (1_000_000_000 * 2 // 3) * 1 // 2


def test_max_drawdown_hand_example(spark, monkeypatch):
    """Values +10, −4, −3, +20, −1 → cum 10, 6, 3, 23, 22; peaks 10,
    10, 10, 23, 23; drawdowns 0, 4, 7, 0, 1 → max 7, peak 23."""
    from yougile_etl_pipeline_spark import registry_r13
    from yougile_etl_pipeline_spark.registry import QUERIES

    ev = _events(spark, [
        (0, 1, 1000, "view", 10.0), (1, 1, 2000, "view", -4.0),
        (2, 1, 3000, "view", -3.0), (3, 1, 4000, "view", 20.0),
        (4, 1, 5000, "view", -1.0),
    ])
    monkeypatch.setattr(registry_r13, "load_table",
                        lambda spark, sf, name: ev)
    (row,) = QUERIES["events_max_drawdown"](spark, "ignored").collect()
    assert row["max_drawdown_cents"] == 700
    assert row["peak_cents"] == 2300


def test_max_drawdown_single_shuffle(spark):
    from yougile_etl_pipeline_spark.registry import QUERIES

    from tests.conftest import SF_SMOKE

    prof = plan_profile(QUERIES["events_max_drawdown"](spark, SF_SMOKE))
    # one user-keyed exchange feeds both stacked windows + the final
    # aggregate (partial agg rides the same partitioning)
    assert prof["shuffle_exchanges"] <= 2, prof


def test_mann_whitney_all_ties_is_exact_half(spark, monkeypatch):
    """All values identical: every cross-arm comparison is a tie, so
    U1 = n1·n2/2 exactly (u1_x2 == n1·n2) and the tie-corrected
    variance is zero — the gate must read z = 0, not NaN."""
    from yougile_etl_pipeline_spark import registry_r13
    from yougile_etl_pipeline_spark.registry import QUERIES

    orders = spark.createDataFrame(
        [(i, 42.00) for i in range(40)],
        "o_orderkey long, o_totalprice double")
    monkeypatch.setattr(registry_r13, "load_table",
                        lambda spark, sf, name: orders)
    (row,) = QUERIES["quality_mann_whitney_gate"](
        spark, "ignored").collect()
    assert row["n1"] + row["n2"] == 40
    assert row["u1_x2"] == row["n1"] * row["n2"]
    assert row["z"] == 0.0
    assert row["significant"] is False


def test_wav_trim_all_quiet_payload(spark):
    from yougile_etl_pipeline_spark.operators.media_codec import wav_encode
    from yougile_etl_pipeline_spark.operators.multimodal import (
        wav_trim_stats,
    )

    quiet = np.full(32, 100, dtype="<i2")
    loudish = np.array([0, -30000, 50, 30000, 0], dtype="<i2")
    df = spark.createDataFrame(
        [(1, bytearray(wav_encode(quiet, 8000))),
         (2, bytearray(wav_encode(loudish, 8000)))],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in wav_trim_stats(df).collect()}
    assert (rows[1]["first_loud"], rows[1]["last_loud"]) == (-1, -1)
    assert rows[1]["trimmed_len"] == 0 and rows[1]["trimmed_abs_sum"] == 0
    assert (rows[2]["first_loud"], rows[2]["last_loud"]) == (1, 3)
    assert rows[2]["trimmed_len"] == 3
    assert rows[2]["trimmed_abs_sum"] == 30000 + 50 + 30000


def test_tv_drift_hand_example(spark, monkeypatch):
    """First half: 4 clicks; second half: 4 views, over days 0..3
    (mid = 1). TV = ½(|1e6−0| + |0−1e6|) = 1e6 ppm — total swap."""
    from yougile_etl_pipeline_spark import registry_r13
    from yougile_etl_pipeline_spark.registry import QUERIES

    D = 86_400_000
    ev = _events(spark, [
        (0, 1, 0 * D, "click", 1.0), (1, 1, 0 * D, "click", 1.0),
        (2, 1, 1 * D, "click", 1.0), (3, 1, 1 * D, "click", 1.0),
        (4, 1, 2 * D, "view", 1.0), (5, 1, 2 * D, "view", 1.0),
        (6, 1, 3 * D, "view", 1.0), (7, 1, 3 * D, "view", 1.0),
    ])
    monkeypatch.setattr(registry_r13, "load_table",
                        lambda spark, sf, name: ev)
    (row,) = QUERIES["quality_tv_drift_gate"](spark, "ignored").collect()
    assert (row["n_first"], row["n_second"]) == (4, 4)
    assert row["tv_ppm"] == 1_000_000
    assert row["drifted"] is True
