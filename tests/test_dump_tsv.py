"""Dump artifact layout parity (S3/S7): TSV group files + cols-metadata +
success token round-trip losslessly, nulls encode as the reference's
single space, and a dump without its success token is rejected."""

from __future__ import annotations

import os

import pytest

from tis_spark.sources.dump import DEFAULT_GROUPS, dump_tsv, read_tsv_dump


def test_dump_tsv_roundtrip(spark, tmp_table_dir):
    rows = [
        (1, "alpha beta", 2.5, None),
        (2, None, None, 7),
        (3, "gamma", -1.0, 0),
        (4, " ", 0.0, None),  # a real single-space value...
    ]
    df = spark.createDataFrame(rows, "id long, txt string, score double, n int")
    path = os.path.join(tmp_table_dir, "dump")
    meta = dump_tsv(df, path, shard_col="id")

    assert meta["columns"] == ["id", "txt", "score", "n"]
    assert os.path.exists(os.path.join(path, "success"))
    group_dirs = [d for d in os.listdir(path) if d.isdigit()]
    assert 1 <= len(group_dirs) <= DEFAULT_GROUPS

    back = read_tsv_dump(spark, path)
    assert back.schema == df.schema
    got = sorted(tuple(r) for r in back.collect())
    # ...which collides with the reference's null token by design: a lone
    # space reads back as null (the reference has the same ambiguity).
    exp = sorted([(1, "alpha beta", 2.5, None), (2, None, None, 7), (3, "gamma", -1.0, 0), (4, None, 0.0, None)])
    assert got == exp


def test_dump_without_success_token_rejected(spark, tmp_table_dir):
    df = spark.createDataFrame([(1, "x")], "id long, txt string")
    path = os.path.join(tmp_table_dir, "dump2")
    dump_tsv(df, path, shard_col="id")
    os.unlink(os.path.join(path, "success"))
    with pytest.raises(FileNotFoundError):
        read_tsv_dump(spark, path)
