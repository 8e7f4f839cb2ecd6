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
