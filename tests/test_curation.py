"""Composed corpus-curation pipeline: funnel semantics + shard-export
integration (the oracle twin lives in queries/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.operators.curation import (
    curate_corpus,
    funnel_counts,
)


def _corpus(spark):
    good = " ".join(f"tok{i % 37} word{i % 11}" for i in range(40))
    rows = []
    for i in range(8):
        rows.append((i, good + f" tail{i}", "siteA", "en"))   # quality docs
    rows.append((100, good + " tail0", "siteA", "en"))        # exact dup of 0
    rows.append((101, "short", "siteB", "en"))                # fails quality
    rows.append((102, good + " tail1 extra", "siteB", "en"))  # near-dup of 1
    return spark.createDataFrame(rows, ["doc_id", "text", "source", "lang"])


def test_funnel_stages_monotonic_and_correct(spark):
    final, stages = curate_corpus(_corpus(spark), cap_n=3)
    names = [n for n, _ in stages]
    assert names == [
        "raw", "exact_dedup", "quality", "near_dedup", "domain_cap",
    ]
    counts = {r["stage"]: r["n_docs"] for r in funnel_counts(stages).collect()}
    assert counts["raw"] == 11
    assert counts["exact_dedup"] == 10      # doc 100 collapses into 0
    assert counts["quality"] == 9           # doc 101 dropped
    # docs 0..7 are near-dups of each other (same shingle sets up to
    # the tail token); 102 clusters with them too -> few canonicals
    assert counts["near_dedup"] < counts["quality"]
    assert counts["domain_cap"] <= counts["near_dedup"]
    got = {r["doc_id"] for r in final.collect()}
    assert got <= {r["doc_id"] for r in stages[3][1].collect()}
    # cap: at most 3 per (source, lang)
    per_group = (
        final.groupBy("source", "lang").count().collect()
    )
    assert all(r["count"] <= 3 for r in per_group)


def test_curated_corpus_exports_to_shards(spark, tmp_path):
    """End-to-end: curate then shard-export with a verifiable manifest
    — the full training-data terminal flow."""
    from data_engineering_spark.operators.shards import (
        verify_shards,
        write_sharded_dataset,
    )

    final, _ = curate_corpus(_corpus(spark), cap_n=5)
    out = str(tmp_path / "corpus")
    manifest = write_sharded_dataset(
        final.select("doc_id", "text"), out, ["doc_id"], shard_size=2
    )
    n = final.count()
    assert manifest.agg(F.sum("n_rows")).first()[0] == n
    assert (
        verify_shards(spark, out, ["doc_id"])
        .filter(~F.col("ok"))
        .count()
        == 0
    )


def test_star_backend_matches_ppjoin_backend(spark):
    """near_dup='star' must produce the identical curated corpus and
    funnel counts as the exact pair-join backend on data where banding
    recall holds (which the shared DuckDB oracle also checks at all
    three driver scales)."""
    d = _corpus(spark)
    pp_final, pp_stages = curate_corpus(d, cap_n=3)
    st_final, st_stages = curate_corpus(d, cap_n=3, near_dup="star")
    assert sorted(r["doc_id"] for r in pp_final.collect()) == sorted(
        r["doc_id"] for r in st_final.collect()
    )
    pp_counts = {
        (r["stage"], r["n_docs"]) for r in funnel_counts(pp_stages).collect()
    }
    st_counts = {
        (r["stage"], r["n_docs"]) for r in funnel_counts(st_stages).collect()
    }
    assert pp_counts == st_counts


def test_unknown_near_dup_backend_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="near_dup"):
        curate_corpus(_corpus(spark), near_dup="bogus")
