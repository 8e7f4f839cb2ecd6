"""Data-quality constraint suite (operators/checks)."""

from __future__ import annotations

from data_engineering_spark.operators.checks import (
    completeness,
    in_set,
    matches,
    max_value,
    mean_between,
    min_value,
    ri_violations,
    row_count_between,
    run_checks,
    unique,
)


def _report(df):
    return {
        (r["constraint"], r["column"]): r
        for r in (row.asDict() for row in df.collect())
    }


def test_suite_passes_and_fails(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "a", None)],
        "id long, tag string, v double",
    )
    rep = _report(
        run_checks(
            df,
            [
                completeness("id", 1.0),
                completeness("tag", 0.9),  # 3/4 = 0.75 -> fail
                unique("id"),
                unique("tag"),  # 'a' twice -> fail
                min_value("v", 0.0),
                max_value("v", 25.0),  # max=30 -> fail
                mean_between("v", 15.0, 25.0),  # mean=20 -> pass
                in_set("tag", ("a", "b"), 1.0),
                matches("tag", "^[ab]$", 1.0),
                row_count_between(1, 10),
            ],
        )
    )
    assert len(rep) == 10
    assert rep[("completeness", "id")]["passed"]
    assert not rep[("completeness", "tag")]["passed"]
    assert rep[("completeness", "tag")]["value"] == 0.75
    assert rep[("unique", "id")]["passed"]
    assert not rep[("unique", "tag")]["passed"]
    assert rep[("min_value", "v")]["passed"]
    assert not rep[("max_value", "v")]["passed"]
    assert rep[("mean_between", "v")]["passed"]
    assert rep[("mean_between", "v")]["value"] == 20.0
    assert rep[("in_set", "tag")]["passed"]  # NULLs excluded from denom
    assert rep[("matches", "tag")]["passed"]
    assert rep[("row_count_between", None)]["value"] == 4.0


def test_single_scan_plan(spark):
    """All scan constraints fuse into one aggregate over one scan."""
    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    suite = run_checks(
        df,
        [completeness("id"), min_value("v", 0.0), max_value("v", 10.0),
         mean_between("v", 0.0, 10.0), row_count_between(1, 10)],
    )
    plan = suite._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1


def test_ri_violations(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = ri_violations(child, "fk", parent, "pk").collect()[0]
    assert row["value"] == 1.0  # only fk=9 is an orphan; NULL ignored
    assert not row["passed"]


def test_schema_contract_check(spark):
    from data_engineering_spark.operators.checks import (
        schema_contract_check,
    )

    df = spark.createDataFrame(
        [(1, "x", 0.5)], "id long, name string, score double"
    )
    ok = schema_contract_check(
        df, {"id": "bigint", "name": "string", "score": "double"}
    )
    assert ok.count() == 0

    bad = {
        (r["column"], r["violation"]): (r["expected"], r["actual"])
        for r in schema_contract_check(
            df, {"id": "int", "email": "string", "name": "string"}
        ).collect()
    }
    assert bad[("id", "type_mismatch")] == ("int", "bigint")
    assert bad[("email", "missing")] == ("string", None)
    assert bad[("score", "unexpected")] == (None, "double")
    # allow_extra waives only the uncontracted-column rule
    waived = schema_contract_check(
        df, {"id": "bigint", "name": "string"}, allow_extra=True
    )
    assert waived.count() == 0


def test_weighted_quantile_matches_exploded_median(spark):
    """weighted_quantile == plain median over the row-repeated multiset."""
    import statistics

    from data_engineering_spark.operators.profile import weighted_quantile

    rows = [
        ("a", 10.0, 1), ("a", 20.0, 3), ("a", 30.0, 1),
        ("b", 5.0, 10), ("b", 50.0, 1),
        ("c", 7.0, 2), ("c", 7.0, 2), ("c", 9.0, 1),  # ties in value
    ]
    df = spark.createDataFrame(rows, ["g", "v", "w"])
    got = {
        r["g"]: r["v_wq"]
        for r in weighted_quantile(df, "v", "w", ["g"], q=0.5).collect()
    }
    for g in ("a", "b", "c"):
        multiset = sorted(
            v for (gg, v, w) in rows if gg == g for _ in range(w)
        )
        # lower-median convention: smallest v with cum-weight >= half
        expected = statistics.median_low(multiset)
        assert got[g] == expected, (g, got[g], expected)
