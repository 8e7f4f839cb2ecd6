"""End-to-end corpus curation: the operators composed as a real
training-data pipeline, with row accounting asserted at every stage.

quality filter → exact dedup → near-dup clusters → leakage-safe split
→ per-language mixture → sharded export + manifest verify.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.dedup import dedup_exact
from data_engineering_spark.operators.filters import gopher_metrics
from data_engineering_spark.operators.graph import connected_components
from data_engineering_spark.operators.sampling import mixture_sample
from data_engineering_spark.operators.shards import (
    verify_shards,
    write_sharded_dataset,
)
from data_engineering_spark.operators.sketches import uniform_hash60
from data_engineering_spark.operators.text import ngram_jaccard_pairs

SF = "/root/testdata/sf0.01"


def test_full_curation_pipeline(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    n0 = docs.count()

    # 1. quality gate (scan-stage projection; keep flag joined back)
    flags = gopher_metrics(docs).select("doc_id", "keep")
    kept = docs.join(flags, "doc_id").filter(F.col("keep")).select(
        "doc_id", "text", "lang", "n_chars"
    )
    n1 = kept.count()
    assert 0 < n1 <= n0

    # 2. exact dedup (content fingerprint, min doc_id canonical)
    exact = dedup_exact(kept, content_cols=["text"], id_col="doc_id")
    n2 = exact.count()
    assert 0 < n2 <= n1

    # 3. near-dup clusters over the survivors; drop non-canonical
    pairs = ngram_jaccard_pairs(
        exact.select("doc_id", "text"), n=3, threshold=0.6
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    canonical = exact.join(
        comp.select(
            F.col("vertex").alias("doc_id"),
            F.col("component").alias("__c"),
        ),
        "doc_id",
        "left",
    ).filter(
        F.col("__c").isNull() | (F.col("__c") == F.col("doc_id"))
    ).drop("__c")
    n3 = canonical.count()
    assert 0 < n3 <= n2

    # 4. leakage-safe split on the curated set (doc-level is fine now:
    # near-dups are gone, each survivor is its own representative)
    bucket = uniform_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit("e2e"))
    ) % 100
    train = canonical.filter(bucket >= 10)

    # 5. mixture: cap English, keep the rest whole
    langs = {r["lang"] for r in train.select("lang").distinct().collect()}
    targets = {lg: (60 if lg == "en" else 10_000) for lg in langs}
    mixed = mixture_sample(train, "lang", "doc_id", targets, salt="e2e")
    per_lang = {
        r["lang"]: r["n"]
        for r in mixed.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r["lang"]: r["n"]
        for r in train.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lg in langs:
        if lg == "en":
            assert per_lang.get(lg, 0) <= full[lg]
        else:
            assert per_lang[lg] == full[lg]  # uncapped languages intact

    # 6. sharded export + manifest verification
    out = str(tmp_path / "dataset")
    manifest = write_sharded_dataset(
        mixed.select("doc_id", "text", "lang"), out, ["doc_id"],
        shard_size=50,
    )
    n_final = mixed.count()
    assert manifest.agg(F.sum("n_rows")).collect()[0][0] == n_final
    ok = verify_shards(spark, out, ["doc_id"])
    assert all(r["ok"] for r in ok.collect())

    # the funnel only ever narrows, and nothing vanished unaccounted
    assert n0 >= n1 >= n2 >= n3 >= n_final > 0
