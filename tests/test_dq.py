"""Data-quality expectation operators: NULL-as-fail three-valued
logic, one-pass row checks, and uniqueness blast radius."""

from __future__ import annotations

from pyspark.sql import functions as F

from blockchain_data_engineering_spark.operators import dq


def test_row_expectations_null_counts_as_fail(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (4, 0.0)],
        "id LONG, v DOUBLE",
    )
    out = {
        r["check_name"]: (r["n_rows"], r["n_pass"], r["n_fail"])
        for r in dq.row_expectations(
            df,
            {
                "positive:v": F.col("v") > 0,
                "not_null:v": F.col("v").isNotNull(),
            },
        ).collect()
    }
    # v > 0 is NULL for the null row — must count as FAIL, not vanish
    assert out["positive:v"] == (4, 1, 3)
    assert out["not_null:v"] == (4, 3, 1)


def test_row_expectations_single_scan(spark):
    """All checks ride ONE aggregate over one scan — no per-check
    passes (the property that makes a 40-check suite free at 100 TB)."""
    import io as _io
    import re
    from contextlib import redirect_stdout

    df = spark.range(100).select(F.col("id").alias("v"))
    out = dq.row_expectations(
        df,
        {f"c{i}": F.col("v") % (i + 2) == 0 for i in range(8)},
    )
    buf = _io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) (Scan|Range)", plan)) == 1, plan
    assert sum(r["n_pass"] for r in out.collect()) > 0


def test_unique_expectation_blast_radius(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (2,), (3,), (3,)], "k LONG"
    )
    row = dq.unique_expectation(df, ["k"]).collect()[0]
    assert row["check_name"] == "unique:k"
    assert row["n_rows"] == 6
    assert row["n_pass"] == 1  # only key 1 is clean
    assert row["n_fail"] == 5  # ALL rows under duplicated keys


def test_expectation_suite_publish_gate(spark):
    clean = spark.createDataFrame([(1, 5.0), (2, 6.0)], "k LONG, v DOUBLE")
    suite = dq.expectation_suite(
        clean, {"positive:v": F.col("v") > 0}, unique_keys=[["k"]]
    )
    assert suite.where(F.col("n_fail") > 0).isEmpty()

    dirty = spark.createDataFrame([(1, 5.0), (1, -1.0)], "k LONG, v DOUBLE")
    suite = dq.expectation_suite(
        dirty, {"positive:v": F.col("v") > 0}, unique_keys=[["k"]]
    )
    bad = {r["check_name"] for r in suite.where(F.col("n_fail") > 0).collect()}
    assert bad == {"positive:v", "unique:k"}


def test_gated_upsert_quarantines_whole_batch_idempotently(spark, tmp_path):
    """A failing batch must leave the landing table untouched and land
    WHOLE in the quarantine with its failing checks stamped; re-driving
    the same batch_id (checkpoint replay) must not duplicate the
    quarantine; a later clean batch upserts normally."""
    table = "file://" + str(tmp_path / "t")
    quar = "file://" + str(tmp_path / "q")
    checks = {"positive:v": F.col("v") > 0}

    bad = spark.createDataFrame([(1, 5.0), (2, -1.0)], "k LONG, v DOUBLE")
    assert not dq.gated_upsert(bad, table, ["k"], checks, quar, batch_id=7)
    import os

    assert not os.path.exists(str(tmp_path / "t"))
    qdf = spark.read.parquet(quar)
    assert qdf.count() == 2
    assert qdf.select("__failed_checks").distinct().collect()[0][0] == (
        "positive:v"
    )

    # checkpoint replay of the same failing batch: no duplication
    assert not dq.gated_upsert(bad, table, ["k"], checks, quar, batch_id=7)
    assert spark.read.parquet(quar).count() == 2

    good = spark.createDataFrame([(1, 5.0), (2, 1.0)], "k LONG, v DOUBLE")
    assert dq.gated_upsert(good, table, ["k"], checks, quar, batch_id=8)
    assert spark.read.parquet(table).count() == 2


def test_profile_columns_stats(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, None), (2, 8.5)], "k LONG, v DOUBLE"
    )
    out = {
        r["column_name"]: (
            r["n_rows"], r["n_null"], r["n_distinct"], r["min_v"], r["max_v"]
        )
        for r in dq.profile_columns(df, ["k", "v"]).collect()
    }
    assert out["k"] == (3, 0, 2, 1.0, 2.0)
    assert out["v"] == (3, 1, 2, 2.0, 8.5)


def test_check_labels_with_quotes_and_empty_checks_guard(spark):
    """Check/column labels are caller-supplied and routinely quote
    their allowed values (in_set:'O','F') — they must survive the
    stack() round-trip verbatim; empty checks must be a clear
    ValueError, not a stack(0,) ParseException inside the publish
    gate."""
    import pytest

    df = spark.createDataFrame([(1, "O"), (2, "F"), (3, "X")], "k long, s string")
    label = "in_set:'O','F'"
    out = {
        r["check_name"]: r["n_fail"]
        for r in dq.row_expectations(
            df, {label: F.col("s").isin("O", "F")}
        ).collect()
    }
    assert out == {label: 1}

    with pytest.raises(ValueError, match="non-empty"):
        dq.row_expectations(df, {})
    with pytest.raises(ValueError, match="non-empty"):
        dq.profile_columns(df, [])
