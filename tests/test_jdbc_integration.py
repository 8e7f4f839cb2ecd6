"""Live JDBC integration using Spark's embedded Derby: the snapshot
engine's probe → partitioned scan → transform → append flow against a
real relational source (no MySQL in this environment; Derby exercises
the same Spark JDBC source: S2/S3/S4)."""

from __future__ import annotations

import pytest

from data_engineering_spark.snapshot.jdbc_snapshot import (
    JdbcConfig,
    append_snapshot,
    prepare_snapshot_frame,
    query_reader,
    table_reader,
)

URL = "jdbc:derby:memory:jdbcint"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(f"{URL};create=true")
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE sales (sale_id BIGINT PRIMARY KEY, item_id INT, "
        "price DOUBLE, flag SMALLINT)"
    )
    for i in range(1, 201):
        st.execute(
            f"INSERT INTO sales VALUES ({i}, {i % 7}, {i * 1.5}, {i % 2})"
        )
    conn.commit()
    yield URL
    st.execute("DROP TABLE sales")
    conn.commit()


@pytest.fixture()
def cfg():
    # Derby case-folds unquoted identifiers, so use validate-only mode
    # (quoting "sales" would demand an exact-case lowercase table).
    return JdbcConfig(
        url=URL, user="", password="", driver=DRIVER, ident_quote=""
    )


def test_bounds_probe_pushdown(spark, derby, cfg):
    """Aggregate pushed to the source via the `query` option (S4/A1)."""
    bounds = (
        query_reader(
            spark, cfg,
            "SELECT min(sale_id) AS lo, max(sale_id) AS hi FROM sales",
            fetchsize=10,
        )
        .load()
        .collect()[0]
    )
    assert (bounds["LO"], bounds["HI"]) == (1, 200)


def test_range_partitioned_scan(spark, derby, cfg):
    """PK-bounded parallel read (S3): real partitions, complete data."""
    df = table_reader(
        spark, cfg, database="APP", table="sales",
        key="sale_id", lower=1, upper=201, num_partitions=4,
    ).load()
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200
    assert df.selectExpr("sum(sale_id) s").collect()[0]["s"] == 200 * 201 // 2


def test_full_snapshot_flow(spark, derby, cfg, tmp_path):
    """scan → sanitize/compat/stamp → append → re-read (S2→K3)."""
    raw = table_reader(spark, cfg, "APP", "sales").load()
    prepared = prepare_snapshot_frame(raw, tenant_id=4, rds_id=2)
    dest = str(tmp_path / "lake" / "sales")
    append_snapshot(prepared, dest)

    out = spark.read.parquet(dest)
    assert out.count() == 200
    row = out.filter(out.sale_id == 1).collect()[0]
    assert row["__op"] == "r" and row["__tenant_id"] == 4
    assert row["__rds_id"] == 2
    # smallint compat-cast to int (reference boolean/smallint policy)
    assert dict(out.dtypes)["flag"] == "int"


def test_jdbc_upsert_live_roundtrip(spark, derby):
    """Reverse ETL against live Derby: create target, upsert a batch
    (inserts), then a second batch (updates + new rows), verify final
    state by reading the table back through Spark JDBC."""
    from data_engineering_spark.snapshot.jdbc_snapshot import jdbc_upsert

    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE serving (id BIGINT PRIMARY KEY, v DOUBLE, s VARCHAR(20))"
    )
    st.close()
    conn.close()

    cfg = JdbcConfig(
        url=URL, user="", password="", driver=DRIVER, ident_quote=""
    )
    b1 = spark.createDataFrame(
        [(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, "c")], "id long, v double, s string"
    )
    jdbc_upsert(spark, b1, cfg, "serving", ["id"])
    b2 = spark.createDataFrame(
        [(2, 20.0, "B"), (4, 4.0, "d")], "id long, v double, s string"
    )
    jdbc_upsert(spark, b2, cfg, "serving", ["id"], num_partitions=2)

    back = (
        spark.read.format("jdbc")
        .option("url", URL)
        .option("dbtable", "serving")
        .option("driver", DRIVER)
        .load()
    )
    got = sorted(map(tuple, back.collect()))
    assert got == [
        (1, 1.0, "a"),
        (2, 20.0, "B"),
        (3, 3.0, "c"),
        (4, 4.0, "d"),
    ]
    # staging dropped: a fresh upsert recreates it without conflict
    jdbc_upsert(spark, b1.filter("id = 1"), cfg, "serving", ["id"])


def test_upsert_sql_dialects():
    from data_engineering_spark.snapshot.jdbc_snapshot import upsert_sql

    ansi = upsert_sql("t", "t_stg", ["k"], ["k", "a"], "ansi", '"')
    assert 'MERGE INTO "t" t USING "t_stg" s ON (t."k" = s."k")' in ansi
    assert 'UPDATE SET t."a" = s."a"' in ansi and "INSERT" in ansi

    my = upsert_sql("t", "t_stg", ["k"], ["k", "a"], "mysql", "`")
    assert "ON DUPLICATE KEY UPDATE `a` = new.`a`" in my

    pg = upsert_sql("t", "t_stg", ["k"], ["k", "a"], "postgres", '"')
    assert 'ON CONFLICT ("k") DO UPDATE SET "a" = EXCLUDED."a"' in pg
    # keys-only table: postgres degrades to DO NOTHING, ansi drops the
    # MATCHED clause
    assert "DO NOTHING" in upsert_sql("t", "s", ["k"], ["k"], "postgres", '"')
    assert "WHEN MATCHED" not in upsert_sql("t", "s", ["k"], ["k"], "ansi", '"')

    import pytest as _pytest

    with _pytest.raises(ValueError):
        upsert_sql("t;drop", "s", ["k"], ["k"], "ansi", "")


def test_stream_to_jdbc_upsert_end_to_end(spark, derby, tmp_path):
    """The serving-DB sync pipeline: file stream -> foreachBatch ->
    idempotent jdbc_upsert into live Derby. Restarting the stream with
    new input upserts increments; an idle restart applies nothing
    (replay-skip of a delivered batch is covered by
    test_streaming.test_idempotent_sink*, which drives the wrapper's
    ledger directly — Spark 4's checkpoint-integrity guard forbids
    hand-editing commit markers to fake a crash here)."""
    import os

    from data_engineering_spark.snapshot.jdbc_snapshot import jdbc_upsert
    from data_engineering_spark.streaming.runner import idempotent_sink

    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE stream_serve "
        "(id BIGINT PRIMARY KEY, v DOUBLE, tag VARCHAR(10))"
    )
    st.close()
    conn.close()
    cfg = JdbcConfig(
        url=URL, user="", password="", driver=DRIVER, ident_quote=""
    )

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    ledger = str(tmp_path / "ledger")

    def run_stream():
        sink = idempotent_sink(
            lambda bdf, bid: jdbc_upsert(
                spark, bdf, cfg, "stream_serve", ["id"]
            ),
            ledger,
        )
        q = (
            spark.readStream.schema("id long, v double, tag string")
            .parquet(str(src))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        # Spark 4 tracks active checkpoint paths; wait until this
        # query has fully deregistered before a restart reuses ckpt
        import time as _t

        for _ in range(100):
            if all(a.id != q.id for a in spark.streams.active):
                break
            _t.sleep(0.1)

    def serving_state():
        back = (
            spark.read.format("jdbc")
            .option("url", URL)
            .option("dbtable", "stream_serve")
            .option("driver", DRIVER)
            .load()
        )
        return sorted(map(tuple, back.collect()))

    spark.createDataFrame(
        [(1, 1.0, "a"), (2, 2.0, "a")], "id long, v double, tag string"
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()
    assert serving_state() == [(1, 1.0, "a"), (2, 2.0, "a")]

    # second input wave: update id=2, add id=3
    spark.createDataFrame(
        [(2, 20.0, "b"), (3, 3.0, "b")], "id long, v double, tag string"
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()
    assert serving_state() == [(1, 1.0, "a"), (2, 20.0, "b"), (3, 3.0, "b")]

    # idle restart: same checkpoint, no new files -> nothing applied,
    # serving state untouched, no new ledger entries
    applied_before = len(os.listdir(ledger))
    run_stream()
    assert serving_state() == [(1, 1.0, "a"), (2, 20.0, "b"), (3, 3.0, "b")]
    assert len(os.listdir(ledger)) == applied_before


def test_jdbc_upsert_failed_merge_drops_staging(spark, derby):
    """A MERGE that fails server-side (value too long for the target
    column) must still drop its staging table, and concurrent-safe
    default staging names must be unique per call."""
    from data_engineering_spark.snapshot.jdbc_snapshot import jdbc_upsert

    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE narrow (id BIGINT PRIMARY KEY, s VARCHAR(5))"
    )
    st.close()
    conn.close()

    cfg = JdbcConfig(
        url=URL, user="", password="", driver=DRIVER, ident_quote=""
    )
    bad = spark.createDataFrame(
        [(1, "way-too-long-for-varchar5")], "id long, s string"
    )
    with pytest.raises(Exception):
        jdbc_upsert(spark, bad, cfg, "narrow", ["id"])

    # no *_STG_* leftovers anywhere in the schema
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    rs = st.executeQuery(
        "SELECT TABLENAME FROM SYS.SYSTABLES WHERE TABLENAME LIKE '%STG%'"
    )
    leftovers = []
    while rs.next():
        leftovers.append(rs.getString(1))
    rs.close()
    st.close()
    conn.close()
    assert leftovers == []
