"""Partition-scoped merge: only partitions named in the delta are rewritten;
untouched partitions' files stay byte-identical on disk."""

from __future__ import annotations

import glob
import os
from datetime import datetime
from decimal import Decimal

from distribution_engine_smt_spark import schemas, tables
from distribution_engine_smt_spark.tables import merge_into_partitioned

T0 = datetime(2024, 1, 1)


def _post(ap, author, token, title):
    return (ap, author, T0, None, None, True, False, token, Decimal(0), None,
            None, Decimal(0), Decimal(0), 0.0, 0.0, 0, Decimal(0), title, None, 0,
            "", "", 0.0, False)


def _files(root):
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(root, "posts", "token=*", "*.parquet"))
    }


def test_merge_touches_only_delta_partitions(spark, tmp_path):
    root = str(tmp_path)
    base = spark.createDataFrame(
        [_post("@a/p1", "a", "TKN1", "one"), _post("@b/p2", "b", "TKN2", "two"),
         _post("@c/p3", "c", "TKN3", "three")],
        schemas.POSTS,
    )
    tables.write_table(base, root, "posts")
    before = _files(root)

    delta = spark.createDataFrame(
        [_post("@a/p1", "a", "TKN1", "one-v2"),      # update in TKN1
         _post("@d/p4", "d", "TKN4", "four")],        # brand-new partition
        schemas.POSTS,
    )
    touched = merge_into_partitioned(spark, root, "posts", delta)
    assert sorted(touched) == ["TKN1", "TKN4"]

    after = _files(root)
    untouched = {p for p in before if "token=TKN2" in p or "token=TKN3" in p}
    for p in untouched:
        assert p in after and after[p] == before[p], f"untouched partition rewritten: {p}"

    out = tables.read_table(spark, root, "posts")
    got = {(r["authorperm"], r["token"]): r["title"] for r in out.collect()}
    assert got == {
        ("@a/p1", "TKN1"): "one-v2",
        ("@b/p2", "TKN2"): "two",
        ("@c/p3", "TKN3"): "three",
        ("@d/p4", "TKN4"): "four",
    }


def test_merge_into_empty_table(spark, tmp_path):
    root = str(tmp_path)
    delta = spark.createDataFrame([_post("@a/p1", "a", "TKN1", "t")], schemas.POSTS)
    touched = merge_into_partitioned(spark, root, "posts", delta)
    assert touched == ["TKN1"]
    assert tables.read_table(spark, root, "posts").count() == 1


def test_merge_rejects_unpartitioned_table(spark, tmp_path):
    import pytest

    # post_metadata used to be the example here; it is now hash-bucketed and
    # supported — follows has neither a partition value nor a bucket spec
    delta = spark.createDataFrame([], schemas.FOLLOWS)
    with pytest.raises(ValueError):
        merge_into_partitioned(spark, str(tmp_path), "follows", delta)


def test_merge_empty_delta_is_noop(spark, tmp_path):
    """An empty delta merges nothing and rewrites nothing."""
    root = str(tmp_path)
    base = spark.createDataFrame([_post("@a/p1", "a", "TKN1", "one")], schemas.POSTS)
    tables.write_table(base, root, "posts")
    before = _files(root)
    touched = merge_into_partitioned(
        spark, root, "posts", spark.createDataFrame([], schemas.POSTS)
    )
    assert touched == []
    assert _files(root) == before
