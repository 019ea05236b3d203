"""fsutil: Hadoop-FileSystem-routed directory ops (and the os fallback).

Two things are under test: (1) each operation's semantics — idempotent
rmtree, no-clobber rename, leaf profiling that skips hidden/_SUCCESS
files; (2) that with an active SparkSession the calls really route
through the JVM Hadoop FileSystem (the 100 TB-relevant path), which the
tests force by using the session fixture and asserting behavior that
the Hadoop LocalFileSystem implements (e.g. recursive delete).
"""

from __future__ import annotations

import os
import tempfile

import pytest

from yougile_etl_pipeline_spark import fsutil


@pytest.fixture()
def tree(tmp_path):
    """A small parquet-ish tree: root file + two partition dirs, plus
    hidden/_SUCCESS noise that profiling must skip."""
    root = tmp_path / "mart"
    (root / "p=a").mkdir(parents=True)
    (root / "p=b").mkdir()
    (root / "x.parquet").write_bytes(b"\x00" * 100)
    (root / "p=a" / "part-0.parquet").write_bytes(b"\x00" * 10)
    (root / "p=a" / "part-1.parquet").write_bytes(b"\x00" * 30)
    (root / "p=b" / "part-0.parquet").write_bytes(b"\x00" * 50)
    (root / "_SUCCESS").write_bytes(b"")
    (root / "p=a" / ".hidden.parquet").write_bytes(b"\x00" * 999)
    return str(root)


class TestWithActiveSession:
    """spark fixture active -> the Hadoop FileSystem path runs."""

    def test_exists_isdir_listdir(self, spark, tree):
        assert fsutil.exists(tree)
        assert fsutil.is_dir(tree)
        assert not fsutil.is_dir(fsutil.join(tree, "x.parquet"))
        assert not fsutil.exists(fsutil.join(tree, "nope"))
        assert not fsutil.is_dir(fsutil.join(tree, "nope"))
        names = set(fsutil.listdir(tree))
        assert {"p=a", "p=b", "x.parquet", "_SUCCESS"} <= names

    def test_rename_no_clobber(self, spark, tree):
        src = fsutil.join(tree, "p=a")
        dst = fsutil.join(tree, "p=c")
        fsutil.rename(src, dst)
        assert not fsutil.exists(src) and fsutil.is_dir(dst)
        # renaming onto an existing directory must refuse — Hadoop's
        # native rename would nest src INSIDE dst, corrupting the mart
        with pytest.raises(FileExistsError):
            fsutil.rename(dst, fsutil.join(tree, "p=b"))

    def test_rmtree_recursive_and_idempotent(self, spark, tree):
        victim = fsutil.join(tree, "p=a")
        fsutil.rmtree(victim)
        assert not fsutil.exists(victim)
        fsutil.rmtree(victim)  # second call: no error
        fsutil.rmtree(fsutil.join(tree, "never-existed"))

    def test_leaf_parquet_sizes(self, spark, tree):
        prof = fsutil.leaf_parquet_sizes(tree)
        assert sorted(prof) == ["", "p=a", "p=b"]
        assert sorted(prof["p=a"]) == [10, 30]   # .hidden skipped
        assert prof[""] == [100]                 # _SUCCESS skipped
        assert prof["p=b"] == [50]


class TestOsFallback:
    """Force the fallback by monkeypatching the session probe away —
    proves the module still works with no JVM (pure-python callers)."""

    @pytest.fixture(autouse=True)
    def no_jvm(self, monkeypatch):
        monkeypatch.setattr(fsutil, "_fs", lambda path: None)

    def test_roundtrip(self, tree):
        assert fsutil.exists(tree) and fsutil.is_dir(tree)
        assert "p=a" in fsutil.listdir(tree)
        prof = fsutil.leaf_parquet_sizes(tree)
        assert sorted(prof["p=a"]) == [10, 30] and prof[""] == [100]
        src, dst = fsutil.join(tree, "p=a"), fsutil.join(tree, "p=z")
        fsutil.rename(src, dst)
        assert os.path.isdir(dst) and not os.path.exists(src)
        fsutil.rmtree(dst)
        fsutil.rmtree(dst)
        assert not os.path.exists(dst)


def test_join_uri_style():
    assert fsutil.join("/a/b/", "c", "d") == "/a/b/c/d"
    assert fsutil.join("s3a://bucket/key", "p=1") == "s3a://bucket/key/p=1"
