"""Hermetic tests for the paginated REST extractor (S1–S4): cursor
following, rate limiting, schema conformance of landed JSON, and the
partitioned per-key scan."""

from __future__ import annotations

from pyspark.sql import types as T

from yougile_etl_pipeline_spark.sources.rest import (
    RateLimiter,
    fetch_entity,
    fetch_partitioned,
    paginate,
)

SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("extra", T.StringType()),   # never sent by the "API"
])


def make_fake(pages: dict[str | None, list[list[dict]]]):
    """Page server keyed by column_id; each call pops the next page."""
    calls = []

    def fetch(method, offset, limit, include_deleted, column_id):
        calls.append((method, offset, limit, include_deleted, column_id))
        seq = pages[column_id]
        idx = offset // limit
        content = seq[idx] if idx < len(seq) else []
        return {"content": content,
                "paging": {"next": idx + 1 < len(seq)}}

    fetch.calls = calls
    return fetch


def test_paginate_follows_cursor():
    fake = make_fake({None: [[{"id": "1"}], [{"id": "2"}], [{"id": "3"}]]})
    rows = list(paginate(fake, "boards", limit=1))
    assert [r["id"] for r in rows] == ["1", "2", "3"]
    # offsets advanced by limit, stop after paging.next == False
    assert [c[1] for c in fake.calls] == [0, 1, 2]


def test_rate_limiter_spaces_calls():
    t = {"now": 0.0}
    sleeps: list[float] = []
    rl = RateLimiter(1.5, clock=lambda: t["now"],
                     sleep=lambda s: (sleeps.append(s),
                                      t.__setitem__("now", t["now"] + s)))
    rl.wait()                      # first call: no sleep
    t["now"] += 0.4                # 0.4s of work
    rl.wait()                      # must sleep the remaining 1.1
    assert sleeps == [1.1]


def test_fetch_entity_conforms_missing_fields(spark, tmp_path):
    fake = make_fake({None: [[{"id": "1", "title": "A"},
                              {"id": "2"}]]})   # 'title' missing on row 2
    df = fetch_entity(spark, fake, "boards", SCHEMA,
                      landing_dir=str(tmp_path))
    rows = {r.id: r for r in df.collect()}
    assert df.columns == ["id", "title", "extra"]      # P4 conform order
    assert rows["2"].title is None and rows["1"].extra is None


def test_fetch_partitioned_unions_cursors(spark):
    # The fake must be a *closure*, not a module-level function: cloudpickle
    # ships closures by value, while module functions are pickled by
    # reference and the tests package isn't importable on executors.
    def partitioned_fake(method, offset, limit, include_deleted, column_id):
        return {"content": [{"id": f"{column_id}-{offset}",
                             "title": column_id}],
                "paging": {"next": False}}

    df = fetch_partitioned(spark, partitioned_fake, "tasks", SCHEMA,
                           column_ids=["c1", "c2", "c3"], interval_s=0.0)
    got = {r.id for r in df.collect()}
    assert got == {"c1-0", "c2-0", "c3-0"}
    assert df.columns == ["id", "title", "extra"]


def test_fetch_partitioned_fetches_once_across_actions(spark, tmp_path):
    """The paginated fetch runs in exactly ONE Spark job (pages are landed
    to files); downstream actions re-read the landed files and never
    re-invoke the fetcher. Invocations are counted via marker files since
    executor closures can't mutate driver state."""
    calls_dir = tmp_path / "calls"
    calls_dir.mkdir()
    cd = str(calls_dir)

    def counting_fake(method, offset, limit, include_deleted, column_id):
        import os
        import uuid
        open(os.path.join(cd, uuid.uuid4().hex), "w").close()
        return {"content": [{"id": f"{column_id}-{offset}",
                             "title": column_id}],
                "paging": {"next": False}}

    df = fetch_partitioned(spark, counting_fake, "tasks", SCHEMA,
                           column_ids=["c1", "c2"], interval_s=0.0,
                           landing_dir=str(tmp_path / "land"))
    n_after_build = len(list(calls_dir.iterdir()))
    assert df.count() == 2                       # action #1
    assert {r.id for r in df.collect()} == {"c1-0", "c2-0"}   # action #2
    assert n_after_build == 2                    # one call per cursor...
    assert len(list(calls_dir.iterdir())) == 2   # ...and none re-paid
