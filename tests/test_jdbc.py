"""S5/S9 exercised against a real JDBC database: the embedded Derby
engine that ships in Spark's jar directory (no external DB needed).
The reference's JDBC surface is Postgres appends with numPartitions=1
(src/etl_blockchain/main.py:22-29) and ON CONFLICT upserts
(airflow/archive/dags/etl_vol_dag.py:24-39); here the same calls run
end-to-end: append → read-back → MERGE-based upsert, including the
foreachBatch-shaped two-micro-batch sequence.
"""

from __future__ import annotations

import pytest

from blockchain_data_engineering_spark.sources.io import (
    read_jdbc,
    upsert_jdbc,
    write_jdbc,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby(spark) -> bool:
    try:
        spark._jvm.Class.forName(DERBY_DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture()
def derby_url(spark):
    if not _derby(spark):
        pytest.skip("embedded Derby driver not on the Spark classpath")
    import uuid

    return f"jdbc:derby:memory:bde_{uuid.uuid4().hex[:8]};create=true"


PROPS = {"driver": DERBY_DRIVER}


def test_jdbc_append_and_readback(spark, derby_url):
    df = spark.createDataFrame(
        [(1, "blk_a", 10.5), (2, "blk_b", 20.25), (3, "blk_c", 0.0)],
        "id bigint, block_hash string, fees double",
    )
    write_jdbc(df, derby_url, "blocks", mode="overwrite", properties=PROPS)
    # append a second batch — the reference's incremental load shape
    more = spark.createDataFrame(
        [(4, "blk_d", 7.75)], "id bigint, block_hash string, fees double"
    )
    write_jdbc(more, derby_url, "blocks", mode="append", properties=PROPS,
               num_partitions=1)

    back = read_jdbc(spark, derby_url, "blocks", properties=PROPS)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.unionByName(more).collect())
    )


def test_jdbc_upsert_foreachbatch_shape(spark, derby_url):
    """Two micro-batches through the MERGE upsert: batch 2 updates one
    existing key and inserts one new key — exactly the reference's
    ON CONFLICT (pk) DO UPDATE semantics."""
    schema = "addr string, unit string, balance bigint"
    batch1 = spark.createDataFrame(
        [("a1", "lovelace", 100), ("a2", "lovelace", 250)], schema
    )
    # seed the target table (Spark DDL-creates it with matching types)
    write_jdbc(batch1, derby_url, "balances", mode="overwrite", properties=PROPS)

    batch2 = spark.createDataFrame(
        [("a2", "lovelace", 300), ("a3", "tokenX", 7)], schema
    )
    upsert_jdbc(batch2, derby_url, "balances", ["addr", "unit"], properties=PROPS)

    got = {
        (r.addr, r.unit): r.balance
        for r in read_jdbc(spark, derby_url, "balances", properties=PROPS).collect()
    }
    assert got == {
        ("a1", "lovelace"): 100,
        ("a2", "lovelace"): 300,  # updated
        ("a3", "tokenX"): 7,  # inserted
    }

    # idempotency: replaying the same batch changes nothing
    upsert_jdbc(batch2, derby_url, "balances", ["addr", "unit"], properties=PROPS)
    again = {
        (r.addr, r.unit): r.balance
        for r in read_jdbc(spark, derby_url, "balances", properties=PROPS).collect()
    }
    assert again == got


def test_jdbc_upsert_creates_missing_table(spark, derby_url):
    """A first upsert against a table that doesn't exist yet creates
    it from the batch (same first-write semantics as upsert_parquet)
    instead of failing the MERGE with an opaque SQL error."""
    schema = "addr string, balance bigint"
    batch = spark.createDataFrame([("a1", 5), ("a2", 9)], schema)
    upsert_jdbc(batch, derby_url, "fresh_tbl", ["addr"], properties=PROPS)
    got = {
        (r.addr): r.balance
        for r in read_jdbc(
            spark, derby_url, "fresh_tbl", properties=PROPS
        ).collect()
    }
    assert got == {"a1": 5, "a2": 9}
    # and the next batch goes through the MERGE path
    upsert_jdbc(
        spark.createDataFrame([("a2", 11), ("a3", 1)], schema),
        derby_url,
        "fresh_tbl",
        ["addr"],
        properties=PROPS,
    )
    got = {
        (r.addr): r.balance
        for r in read_jdbc(
            spark, derby_url, "fresh_tbl", properties=PROPS
        ).collect()
    }
    assert got == {"a1": 5, "a2": 11, "a3": 1}


def test_jdbc_upsert_schema_guard_and_evolution(spark, derby_url):
    """The shared schema guard (r4 verdict ask #7): a column-set
    mismatch is a clear ValueError BEFORE any SQL runs, a missing key
    column is always refused, and merge_schema=True evolves the table
    via ALTER TABLE ADD COLUMN with NULL-fill in both directions —
    the same contract as the parquet upsert family."""
    base = spark.createDataFrame(
        [("a1", 100), ("a2", 200)], "addr string, balance bigint"
    )
    upsert_jdbc(base, derby_url, "evo", ["addr"], properties=PROPS)

    widened = spark.createDataFrame(
        [("a2", 250, 3), ("a3", 7, 1)],
        "addr string, balance bigint, epoch bigint",
    )
    with pytest.raises(ValueError, match=r"new columns \['epoch'\]"):
        upsert_jdbc(widened, derby_url, "evo", ["addr"], properties=PROPS)
    with pytest.raises(ValueError, match=r"key columns \['addr'\]"):
        upsert_jdbc(
            spark.createDataFrame([(1,)], "balance bigint"),
            derby_url,
            "evo",
            ["addr"],
            properties=PROPS,
        )

    # evolution: new column ALTERed in, pre-existing rows NULL-filled
    upsert_jdbc(
        widened, derby_url, "evo", ["addr"], properties=PROPS,
        merge_schema=True,
    )
    got = {
        r.addr: (r.balance, r.epoch)
        for r in read_jdbc(spark, derby_url, "evo", properties=PROPS).collect()
    }
    assert got == {"a1": (100, None), "a2": (250, 3), "a3": (7, 1)}

    # the other direction: a narrower batch leaves absent columns NULL
    # for inserted rows, untouched for updated rows
    upsert_jdbc(
        spark.createDataFrame([("a4", 40)], "addr string, balance bigint"),
        derby_url,
        "evo",
        ["addr"],
        properties=PROPS,
        merge_schema=True,
    )
    got = {
        r.addr: (r.balance, r.epoch)
        for r in read_jdbc(spark, derby_url, "evo", properties=PROPS).collect()
    }
    assert got["a4"] == (40, None) and got["a2"] == (250, 3)


def test_jdbc_upsert_underscore_name_not_confused_by_like_sibling(
    spark, derby_url
):
    """DatabaseMetaData.getColumns takes a LIKE pattern ('_' matches
    any char): with a sibling table whose name matches the unescaped
    pattern (TXALOG vs TX_LOG), the first write to tx_log must still
    detect the table as MISSING and create it — an unescaped probe
    reads the sibling's columns, skips CREATE, and the MERGE dies with
    table-not-found (sources/io._jdbc_table_columns escaping)."""
    sibling = spark.createDataFrame([(1, "x")], "k bigint, other string")
    write_jdbc(sibling, derby_url, "txalog", mode="overwrite", properties=PROPS)

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    upsert_jdbc(df, derby_url, "tx_log", ["k"], properties=PROPS)
    upd = spark.createDataFrame([(2, "B"), (3, "c")], "k bigint, v string")
    upsert_jdbc(upd, derby_url, "tx_log", ["k"], properties=PROPS)

    back = read_jdbc(spark, derby_url, "tx_log", properties=PROPS)
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "B"), (3, "c")]
    # the sibling is untouched
    sib = read_jdbc(spark, derby_url, "txalog", properties=PROPS)
    assert sib.columns == ["k", "other"]


def test_jdbc_table_columns_cross_schema_duplicate_is_ambiguous(
    spark, derby_url
):
    """Two same-named tables in DIFFERENT schemas must raise the
    ambiguity error from an unqualified probe (merging their column
    lists would drive wrong schema-evolution ALTERs — ADVICE r5), and
    a schema-qualified probe must return only that schema's columns."""
    from blockchain_data_engineering_spark.sources.io import (
        _jdbc_table_columns,
    )

    jvm = spark._jvm
    jprops = jvm.java.util.Properties()
    jprops.setProperty("driver", DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(derby_url, jprops)
    try:
        st = conn.createStatement()
        st.executeUpdate("CREATE SCHEMA SCH_A")
        st.executeUpdate("CREATE SCHEMA SCH_B")
        st.executeUpdate("CREATE TABLE SCH_A.DUP_T (k BIGINT, va VARCHAR(8))")
        st.executeUpdate("CREATE TABLE SCH_B.DUP_T (k BIGINT, vb VARCHAR(8))")
        st.close()

        with pytest.raises(ValueError, match="ambiguous"):
            _jdbc_table_columns(conn, "dup_t")

        cols_a = _jdbc_table_columns(conn, "sch_a.dup_t")
        cols_b = _jdbc_table_columns(conn, "SCH_B.DUP_T")
        assert [c.lower() for c in cols_a] == ["k", "va"]
        assert [c.lower() for c in cols_b] == ["k", "vb"]
        # a qualified probe for an absent schema is simply missing
        assert _jdbc_table_columns(conn, "sch_c.dup_t") == []
    finally:
        conn.close()
