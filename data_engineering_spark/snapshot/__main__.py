"""Snapshot entry point — the spark-submit twin of the reference's
``sanpshot_script.py`` module body (:241-269).

    spark-submit -m data_engineering_spark.snapshot \
        --url 'jdbc:mysql://host:3306' --user u --password p \
        --db-pattern 'oms.*' --lake-root /data/lake \
        --rds-id 1 --tenant-id 4 [--num-partitions 5]

Discovers tables via information_schema, skips ones already recorded in
the audit log, range-partition-scans each on its primary key, and
appends sanitized/stamped frames to the lake.
"""

from __future__ import annotations

import argparse
import json

from data_engineering_spark.session import get_session
from data_engineering_spark.snapshot.jdbc_snapshot import (
    JdbcConfig,
    run_snapshot,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="data_engineering_spark.snapshot")
    p.add_argument("--url", required=True)
    p.add_argument("--user", default="")
    p.add_argument("--password", default="")
    p.add_argument("--driver", default="com.mysql.cj.jdbc.Driver")
    p.add_argument("--db-pattern", required=True)
    p.add_argument("--lake-root", required=True)
    p.add_argument("--rds-id", type=int, required=True)
    p.add_argument("--tenant-id", type=int, required=True)
    p.add_argument("--num-partitions", type=int, default=5)
    p.add_argument(
        "--ident-quote",
        default="`",
        help="identifier quote char for the source dialect"
        " ('' = validate-only)",
    )
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    spark = get_session(app_name="jdbc-snapshot")
    cfg = JdbcConfig(
        url=args.url,
        user=args.user,
        password=args.password,
        driver=args.driver,
        ident_quote=args.ident_quote,
    )
    results = run_snapshot(
        spark,
        cfg,
        db_pattern=args.db_pattern,
        lake_root=args.lake_root,
        rds_id=args.rds_id,
        tenant_id=args.tenant_id,
        num_partitions=args.num_partitions,
    )
    print(json.dumps({"snapshotted": results}))


if __name__ == "__main__":
    main()
