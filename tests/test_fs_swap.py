"""functions/fs: existence checks + the rename-based compaction swap."""

from __future__ import annotations

import os

from admira_etl_project_prueba_spark.functions.fs import path_exists, swap_into_place


def _mkstore(path: str, marker: str) -> None:
    os.makedirs(path)
    with open(os.path.join(path, "part-0"), "w") as f:
        f.write(marker)


def _marker(path: str) -> str:
    with open(os.path.join(path, "part-0")) as f:
        return f.read()


def test_path_exists(spark, tmp_path):
    p = str(tmp_path / "x")
    assert not path_exists(spark, p)
    _mkstore(p, "a")
    assert path_exists(spark, p)


def test_swap_replaces_dst_and_cleans_up(spark, tmp_path):
    dst, tmp = str(tmp_path / "store"), str(tmp_path / "store__compacting")
    _mkstore(dst, "old")
    _mkstore(tmp, "new")
    swap_into_place(spark, tmp, dst)
    assert _marker(dst) == "new"
    assert not os.path.exists(tmp)
    assert not os.path.exists(dst + "__old")


def test_swap_clears_stale_old_from_prior_crash(spark, tmp_path):
    dst, tmp = str(tmp_path / "store"), str(tmp_path / "store__compacting")
    _mkstore(dst, "old")
    _mkstore(tmp, "new")
    _mkstore(dst + "__old", "stale-crash-leftover")
    swap_into_place(spark, tmp, dst)
    assert _marker(dst) == "new"
    assert not os.path.exists(dst + "__old")
