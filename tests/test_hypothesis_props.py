"""Hypothesis property tests: cross-engine fingerprint model, schema
inference totality, LWW algebra — plus sketch-accuracy bounds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_engineering_spark.cdc.envelope import infer_from_envelope_schema
from data_engineering_spark.types.mappings import mysql_type_to_spark

# ---- pure-python properties (no Spark session per example) ----------------


@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "field": st.text(
                    alphabet="abcdefghij _-XYZ", min_size=1, max_size=12
                ),
                "type": st.sampled_from(
                    ["int16", "int32", "int64", "float32", "float64",
                     "boolean", "string", "bytes", "garbage_type"]
                ),
                "optional": st.booleans(),
            }
        ),
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_schema_inference_is_total(fields):
    """Any Debezium field list infers to a full Spark schema — no field
    shape may crash inference (reference :201-205 totality)."""
    inferred = infer_from_envelope_schema({"fields": fields})
    assert len(inferred.struct.fields) == len(fields)


@given(st.text(alphabet="abcdefgh()0123, 45", min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_mysql_mapping_is_total(t):
    assert isinstance(mysql_type_to_spark(t), str)


def _py_fingerprint(text: str) -> int:
    acc = 0
    for ch in text:
        acc = (acc * 31 + ord(ch)) % 1_000_000_007
    return acc


def test_fingerprint_matches_python_model(spark):
    """The Spark rolling-hash must equal the obvious sequential python
    model (and therefore DuckDB's list_reduce — same recurrence)."""
    texts = ["", "a", "hello world", "ünïcodé", "x" * 500, "a b  c\td"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["id", "text"])
    chars = F.split("text", "")
    fp = F.aggregate(
        chars, F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % 1_000_000_007,
    )
    got = {r["id"]: r["fp"] for r in df.select("id", fp.alias("fp")).collect()}
    for i, t in enumerate(texts):
        # Spark split('') on '' yields [''] with ascii('')=0 → same as model
        expect = _py_fingerprint(t)
        assert got[i] == expect, (t, got[i], expect)


def test_approx_aggregates_error_bounds(spark, sf_dir):
    from data_engineering_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["a"]
        for r in e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("a"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, n, approx[k])


# ---- round-3 corpus filters vs plain-python models ------------------------

_WORDS = st.lists(
    st.text(alphabet="abcXY.!?#12", min_size=1, max_size=6),
    min_size=0,
    max_size=40,
)


def _py_gopher(text: str):
    # tokens() maps empty/whitespace-only text to an EMPTY list (the
    # phantom-[''] split quirk is guarded against in the operator)
    toks = text.split()
    n = len(toks)
    return (
        n,
        sum(len(w) for w in toks),
        sum(1 for w in toks if any(c.isalpha() and c.isascii() for c in w)),
    )


def _py_repetition(text: str, ngram: int = 3):
    toks = text.split() or [""]
    grams = [
        " ".join(toks[i : i + ngram])
        for i in range(len(toks) - ngram + 1)
    ]
    return len(grams), len(set(grams))


@given(st.lists(_WORDS, min_size=1, max_size=8))
@settings(max_examples=15, deadline=None)
def test_filters_match_python_model(spark, docs_words):
    """gopher_metrics / repetition_metrics equal the obvious python
    models on arbitrary generated token lists (including empties and
    punctuation-only tokens)."""
    from data_engineering_spark.operators.filters import (
        gopher_metrics,
        repetition_metrics,
    )
    texts = [" ".join(ws) for ws in docs_words]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    g = {r["doc_id"]: r for r in gopher_metrics(df).collect()}
    r_ = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    for i, t in enumerate(texts):
        n, chars, alpha = _py_gopher(t.strip())
        assert g[i]["n_tokens"] == n, (t, g[i])
        assert g[i]["char_sum"] == chars, (t, g[i])
        assert g[i]["n_alpha_tokens"] == alpha, (t, g[i])
        total, distinct = _py_repetition(t.strip())
        assert r_[i]["n_grams"] == max(total, 0), t
        if total > 0:
            assert r_[i]["n_distinct"] == distinct, t


def _py_span_dedup(texts: dict[int, str], block: int):
    """Sequential model of text.span_dedup: global first occurrence of
    each verbatim token block (by (doc_id, block_idx)) survives."""
    blocks = {}
    for doc_id in sorted(texts):
        toks = texts[doc_id].strip().split() or [""]
        n = max(-(-len(toks) // block), 1)
        for idx in range(n):
            bt = " ".join(toks[idx * block : (idx + 1) * block])
            blocks.setdefault(bt, (doc_id, idx))
    out = {}
    for doc_id in sorted(texts):
        toks = texts[doc_id].strip().split() or [""]
        n = max(-(-len(toks) // block), 1)
        kept = [
            " ".join(toks[idx * block : (idx + 1) * block])
            for idx in range(n)
            if blocks[" ".join(toks[idx * block : (idx + 1) * block])]
            == (doc_id, idx)
        ]
        out[doc_id] = (n, len(kept), " ".join(kept))
    return out


@given(st.lists(_WORDS, min_size=1, max_size=6))
@settings(max_examples=10, deadline=None)
def test_span_dedup_matches_python_model(spark, docs_words):
    from data_engineering_spark.operators.text import span_dedup

    texts = {i: " ".join(ws) for i, ws in enumerate(docs_words)}
    df = spark.createDataFrame(
        list(texts.items()), ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept_blocks"], r["clean_text"])
        for r in span_dedup(df, block=2).collect()
    }
    assert got == _py_span_dedup(texts, block=2)


def _py_c4(text: str, min_words=5, min_kept=3):
    import re

    lines = text.split("\n")
    kept = [
        l for l in lines
        if len(re.findall(r"\S+", l)) >= min_words
        and re.search(r"[.!?]$", l.strip())
        and "lorem ipsum" not in l.lower()
        and "cookie" not in l.lower()
        and "javascript" not in l.lower()
    ]
    return len(lines), len(kept), "\n".join(kept), len(kept) >= min_kept


@given(
    st.lists(
        st.lists(_WORDS.map(lambda ws: " ".join(ws)), max_size=1),
        min_size=1,
        max_size=6,
    ),
    st.data(),
)
@settings(max_examples=10, deadline=None)
def test_c4_line_filter_matches_python_model(spark, docs, data):
    from data_engineering_spark.operators.filters import c4_line_filter

    # build docs of 0-4 lines; randomly punctuate/boilerplate lines
    texts = []
    for i, _ in enumerate(docs):
        n_lines = data.draw(st.integers(0, 4))
        lines = []
        for _ in range(n_lines):
            ws = data.draw(_WORDS)
            line = " ".join(ws)
            if data.draw(st.booleans()):
                line += "."
            if data.draw(st.integers(0, 5)) == 0:
                line += " please accept our Cookie policy"
            lines.append(line)
        texts.append((i, "\n".join(lines)))
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_lines"], r["n_kept_lines"], r["clean_text"], r["keep"]
        )
        for r in c4_line_filter(df).collect()
    }
    for i, t in texts:
        assert got[i] == _py_c4(t), (t, got[i])


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.sampled_from(["a", "b", "c"]),
            st.one_of(st.none(), st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False)),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=12, deadline=None)
def test_checks_match_python_model(spark, rows):
    """run_checks metrics equal a plain-python recomputation on
    arbitrary small frames (nulls included)."""
    from data_engineering_spark.operators.checks import (
        completeness,
        min_value,
        row_count_between,
        run_checks,
        unique,
    )

    df = spark.createDataFrame(rows, "id long, tag string, v double")
    rep = {
        (r["constraint"], r["column"]): r
        for r in run_checks(
            df,
            [completeness("v", 0.9), unique("tag"),
             min_value("v", 0.0), row_count_between(1, 1000)],
        ).collect()
    }
    vs = [r[2] for r in rows]
    nn = [v for v in vs if v is not None]
    assert rep[("completeness", "v")]["value"] == len(nn) / len(rows)
    tags = [r[1] for r in rows]
    assert rep[("unique", "tag")]["value"] == len(set(tags)) / len(tags)
    if nn:
        assert rep[("min_value", "v")]["value"] == min(nn)
        assert rep[("min_value", "v")]["passed"] == (min(nn) >= 0.0)
    assert rep[("row_count_between", None)]["value"] == float(len(rows))


@given(
    st.dictionaries(
        st.sampled_from(["w", "x", "y"]),
        st.integers(min_value=0, max_value=500),
        min_size=1,
    )
)
@settings(max_examples=10, deadline=None)
def test_mixture_sample_respects_caps(spark, targets):
    """mixture_sample never exceeds actual domain size, keeps all rows
    when target >= actual, and emits no unlisted domain."""
    from data_engineering_spark.operators.sampling import mixture_sample

    df = spark.range(600).selectExpr(
        "id as doc_id",
        "CASE WHEN id % 3 = 0 THEN 'w' WHEN id % 3 = 1 THEN 'x' "
        "ELSE 'z' END AS dom",
    )
    out = mixture_sample(df, "dom", "doc_id", targets, salt="p")
    got = {
        r["dom"]: r["n"]
        for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    sizes = {"w": 200, "x": 200, "z": 200}
    assert set(got) <= ({"w", "x"} & set(targets))
    for d, n in got.items():
        assert n <= sizes[d]
        if targets[d] >= sizes[d]:
            assert n == sizes[d]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=40_000),
)
def test_water_fill_invariants(spark, demands, budget):
    """For ANY demand vector and budget: no source exceeds its demand,
    the budget is exactly exhausted when binding (fully satisfied
    otherwise), and allocation is monotone in demand (max-min
    fairness)."""
    from data_engineering_spark.operators.filters import water_fill

    df = spark.createDataFrame(
        [(f"s{i}", d) for i, d in enumerate(demands)], ["src", "dem"]
    )
    rows = water_fill(df, "src", "dem", budget=budget).collect()
    alloc = {r["src"]: r["alloc"] for r in rows}
    dem = {f"s{i}": d for i, d in enumerate(demands)}
    assert all(alloc[s] <= dem[s] + 1e-9 for s in alloc)
    total = sum(alloc.values())
    expect = min(budget, sum(demands))
    assert abs(total - expect) < 1e-6 * max(1, expect)
    ordered = sorted(alloc, key=lambda s: (dem[s], s))
    for a, b in zip(ordered, ordered[1:]):
        assert alloc[a] <= alloc[b] + 1e-9
