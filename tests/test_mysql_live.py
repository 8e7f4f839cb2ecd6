"""Live-MySQL integration for the JDBC snapshot engine (VERDICT r8
item 2: the last of the live-backend trio, after Kafka and Iceberg).

The sandbox has no MySQL server or Connector/J jar, so this file SKIPS
cleanly here; in any environment with both it turns on with zero code
changes:

    # server (e.g.):
    docker run -d -p 3306:3306 -e MYSQL_ROOT_PASSWORD=secret mysql:8.4
    # connector jar (Maven Central):
    #   com/mysql/mysql-connector-j/9.1.0/mysql-connector-j-9.1.0.jar
    MYSQL_URL="jdbc:mysql://127.0.0.1:3306" \
    MYSQL_USER=root MYSQL_PASSWORD=secret \
    MYSQL_JDBC_JAR=jars/mysql-connector-j-9.1.0.jar \
      python -m pytest tests/test_mysql_live.py -v

Run STANDALONE (its SparkSession needs the connector jar on the
classpath at build time).

What it proves when it runs — exactly the dialect surfaces the
embedded-Derby integration (tests/test_jdbc_snapshot.py) cannot
execute, only string-check:

- `primary_key_sql` against the real information_schema
  (COLUMN_KEY = 'PRI', reference sanpshot_script.py:67-76)
- `discover_tables_sql`'s `information_schema ... REGEXP` pushdown
  (reference :249-256 — REGEXP is MySQL-only syntax)
- backtick identifier quoting end-to-end, including a table name with
  an embedded space that bare/ANSI quoting cannot express
- the range-partitioned scan producing real parallel JDBC partitions
  (reference :117-129)
- `snapshot_table(key='auto')` — the full PK-discovery orchestration
- `jdbc_upsert(dialect='mysql')` — INSERT ... AS new ON DUPLICATE KEY
  UPDATE (8.0+ alias form) executed by a real server
"""

from __future__ import annotations

import glob
import os
import uuid

import pytest


def _mysql_jar() -> str | None:
    env = os.environ.get("MYSQL_JDBC_JAR")
    if env and all(os.path.exists(p) for p in env.split(",")):
        return env
    import pyspark

    roots = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
    if os.environ.get("SPARK_HOME"):
        roots.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    for root in roots:
        hits = glob.glob(os.path.join(root, "mysql-connector-j*.jar"))
        if hits:
            return ",".join(hits)
    return None


_URL = os.environ.get("MYSQL_URL")
_USER = os.environ.get("MYSQL_USER", "root")
_PASSWORD = os.environ.get("MYSQL_PASSWORD", "")
_JAR = _mysql_jar()

pytestmark = pytest.mark.skipif(
    not (_URL and _JAR),
    reason=(
        "live MySQL evidence needs MYSQL_URL pointing at a server AND "
        "the Connector/J jar (MYSQL_JDBC_JAR or $SPARK_HOME/jars) — "
        "see module docstring for the exact invocation"
    ),
)


@pytest.fixture(scope="module")
def mysql_spark():
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        yield active  # the connector is classpath-level; reuse works
        return
    s = (
        SparkSession.builder.master("local[4]")
        .appName("mysql-live-tests")
        .config("spark.jars", _JAR)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def _cfg():
    from data_engineering_spark.snapshot.jdbc_snapshot import JdbcConfig

    return JdbcConfig(
        url=_URL, user=_USER, password=_PASSWORD,
        driver="com.mysql.cj.jdbc.Driver",
    )


def _exec(spark, *statements: str) -> None:
    """DDL/DML straight through the JVM driver (no Spark job)."""
    jvm = spark._jvm
    jvm.java.lang.Class.forName("com.mysql.cj.jdbc.Driver")
    conn = jvm.java.sql.DriverManager.getConnection(_URL, _USER, _PASSWORD)
    try:
        st = conn.createStatement()
        try:
            for sql in statements:
                st.executeUpdate(sql)
        finally:
            st.close()
    finally:
        conn.close()


@pytest.fixture()
def mysql_db(mysql_spark):
    """A throwaway database seeded with one PK'd table, one keyless
    table, and one backtick-hostile name; dropped afterwards."""
    db = f"snaplive_{uuid.uuid4().hex[:8]}"
    _exec(
        mysql_spark,
        f"CREATE DATABASE {db}",
        f"CREATE TABLE {db}.users ("
        "  user_id BIGINT PRIMARY KEY,"
        "  name VARCHAR(64), active BOOLEAN)",
        f"INSERT INTO {db}.users VALUES "
        + ", ".join(f"({i}, 'u{i}', {i % 2})" for i in range(1, 101)),
        f"CREATE TABLE {db}.`audit log` (note VARCHAR(64))",
        f"INSERT INTO {db}.`audit log` VALUES ('created')",
    )
    yield db
    _exec(mysql_spark, f"DROP DATABASE IF EXISTS {db}")


def test_pk_probe_and_regexp_discovery(mysql_spark, mysql_db):
    from data_engineering_spark.snapshot.jdbc_snapshot import (
        discover_tables_sql,
        primary_key_sql,
        query_reader,
    )

    pk = (
        query_reader(
            mysql_spark, _cfg(), primary_key_sql(mysql_db, "users"), 50
        )
        .load()
        .collect()
    )
    assert [r[0] for r in pk] == ["user_id"]

    found = {
        r[0]
        for r in query_reader(
            mysql_spark, _cfg(), discover_tables_sql(f"^{mysql_db}$"), 50
        )
        .load()
        .collect()
    }
    assert found == {f"{mysql_db}.users", f"{mysql_db}.audit log"}


def test_range_partitioned_scan_is_parallel_and_complete(
    mysql_spark, mysql_db
):
    from data_engineering_spark.snapshot.jdbc_snapshot import (
        bounds_sql,
        query_reader,
        table_reader,
    )

    lo, hi = (
        query_reader(
            mysql_spark, _cfg(),
            bounds_sql("user_id", mysql_db, "users"), 10,
        )
        .load()
        .collect()[0]
    )
    assert (int(lo), int(hi)) == (1, 100)
    df = table_reader(
        mysql_spark, _cfg(), mysql_db, "users",
        key="user_id", lower=int(lo), upper=int(hi), num_partitions=4,
    ).load()
    assert df.rdd.getNumPartitions() == 4
    assert sorted(r["user_id"] for r in df.collect()) == list(
        range(1, 101)
    )


def test_backtick_quoted_table_scan(mysql_spark, mysql_db):
    """A name with an embedded space round-trips only through the
    backtick path (`_ident` with the MySQL default quote)."""
    from data_engineering_spark.snapshot.jdbc_snapshot import (
        table_reader,
    )

    rows = (
        table_reader(mysql_spark, _cfg(), mysql_db, "audit log")
        .load()
        .collect()
    )
    assert [r["note"] for r in rows] == ["created"]


def test_snapshot_table_auto_pk_end_to_end(
    mysql_spark, mysql_db, tmp_path
):
    """key='auto': PK probe → bounds → partitioned scan → sanitize/
    stamp → parquet append → audit row (the reference's full per-table
    flow, sanpshot_script.py:199-269)."""
    from data_engineering_spark.snapshot.jdbc_snapshot import (
        snapshot_table,
        snapshotted_tables,
    )

    lake = str(tmp_path / "lake")
    n = snapshot_table(
        mysql_spark, _cfg(), mysql_db, "users", lake,
        rds_id=1, tenant_id=7, num_partitions=4,
    )
    assert n == 100
    out = mysql_spark.read.parquet(f"{lake}/{mysql_db}/users")
    assert out.count() == 100
    row = out.filter("user_id = 3").collect()[0]
    assert row["__op"] == "r" and row["__tenant_id"] == 7
    # boolean -> int compat cast applied on real MySQL BOOLEAN/TINYINT(1)
    assert dict(out.dtypes)["active"] in ("int", "tinyint", "smallint")
    assert snapshotted_tables(mysql_spark, lake, 1) == {
        f"{mysql_db}.users"
    }


def test_jdbc_upsert_on_duplicate_key(mysql_spark, mysql_db):
    """dialect='mysql': one bulk INSERT ... AS new ON DUPLICATE KEY
    UPDATE executed inside the server — updates collide, inserts land."""
    from data_engineering_spark.snapshot.jdbc_snapshot import (
        JdbcConfig,
        jdbc_upsert,
        query_reader,
    )

    cfg = JdbcConfig(
        url=f"{_URL}/{mysql_db}", user=_USER, password=_PASSWORD,
        driver="com.mysql.cj.jdbc.Driver",
    )
    df = mysql_spark.createDataFrame(
        [(1, "updated", 1), (999, "new", 0)],
        "user_id long, name string, active int",
    )
    jdbc_upsert(
        mysql_spark, df, cfg, "users", keys=["user_id"], dialect="mysql"
    )
    got = {
        r["user_id"]: r["name"]
        for r in query_reader(
            mysql_spark, cfg,
            f"SELECT user_id, name FROM {mysql_db}.users "
            "WHERE user_id IN (1, 2, 999)",
            50,
        )
        .load()
        .collect()
    }
    assert got == {1: "updated", 2: "u2", 999: "new"}
