"""Corpus quality / hygiene filters (SURVEY.md §2.11 extension).

The standard cheap pre-training filters — Gopher-style document
quality rules, repetition detection, PII scrubbing, deterministic
train/val/test split assignment. All pure-JVM column expressions
(tokenize once, aggregate over the token array), so every filter runs
inside the scan stage's codegen span: at 100 TB these are one pass
over the corpus with zero shuffles.

References (public): Gopher (Rae et al. 2021) §A1.1 quality
heuristics; C4 (Raffel et al. 2020) line/document filters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_engineering_spark.operators.sketches import uniform_hash60
from data_engineering_spark.operators.text import tokens

# word-character regex shared by gopher_metrics and its oracle: a token
# "has alpha" if it contains at least one ascii letter
_ALPHA_RE = "[a-zA-Z]"

# PII patterns — deliberately simple enough to mean the same thing in
# Java regex (Spark) and RE2 (DuckDB): no lookaround, no \b at pattern
# edges with varying semantics, character classes + quantifiers only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^ \t\n]+"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def gopher_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style per-document quality signals + keep flag.

    Emits: n_tokens, mean_word_len (chars per token over the token
    array), frac_alpha_tokens (tokens containing >=1 ascii letter),
    ends_with_punct, and `keep` = the Gopher rule band
    (50 <= n_tokens <= 100000, 3 <= mean_word_len <= 10,
    frac_alpha >= 0.8). One projection, no shuffle; ratios are
    int/int divisions (bit-identical across engines — see
    cross-engine determinism rules in registry.py).
    """
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col),
        toks.alias("__t"),
        F.col(text_col).alias("__x"),
    )
    n_tokens = F.size("__t")
    char_sum = F.aggregate(
        F.transform("__t", lambda w: F.length(w)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_alpha = F.size(F.filter("__t", lambda w: w.rlike(_ALPHA_RE)))
    mean_word_len = char_sum / F.greatest(n_tokens, F.lit(1))
    frac_alpha = n_alpha / F.greatest(n_tokens, F.lit(1))
    keep = (
        (n_tokens >= 50)
        & (n_tokens <= 100000)
        & (mean_word_len >= 3)
        & (mean_word_len <= 10)
        & (frac_alpha >= 0.8)
    )
    return base.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        char_sum.cast("long").alias("char_sum"),
        mean_word_len.alias("mean_word_len"),
        n_alpha.cast("long").alias("n_alpha_tokens"),
        frac_alpha.alias("frac_alpha"),
        F.col("__x").rlike(r"[.!?]$").alias("ends_with_punct"),
        keep.alias("keep"),
    )


def repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Duplicate n-gram mass per document — the C4/Gopher repetition
    filter: rep_ratio = 1 - distinct_ngrams / total_ngrams. A document
    that repeats boilerplate has high duplicate-gram mass even when no
    single line repeats. Zero-shuffle: positional grams and their
    distinct count both come from the one token array.

    Emits (id, n_grams, n_distinct, rep_ratio); documents shorter than
    `n` tokens emit n_grams = 0 and rep_ratio = 0.0.
    """
    from data_engineering_spark.operators.text import shingles_from_tokens

    base = df.select(F.col(id_col), tokens(text_col).alias("__t"))
    total = F.greatest(F.size("__t") - (n - 1), F.lit(0))
    distinct = F.size(shingles_from_tokens("__t", n))
    ratio = F.when(total > 0, 1.0 - distinct / total).otherwise(F.lit(0.0))
    return base.select(
        F.col(id_col),
        total.cast("long").alias("n_grams"),
        distinct.cast("long").alias("n_distinct"),
        ratio.alias("rep_ratio"),
    )


def scrub_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Count + redact PII-shaped spans (emails, URLs, phone numbers).

    Emits (id, n_emails, n_urls, n_phones, clean_text, clean_len) with
    spans replaced by typed tags. Pure regexp expressions in the scan
    stage — the 100 TB shape is "one pass, no shuffle"; swap the
    regexes for a real PII model via mapInPandas without changing the
    plan around it.
    """
    c = F.col(text_col)
    # URLs redact FIRST (they are the outermost span shape: an email
    # inside a URL is part of the URL, not separate PII), then emails,
    # then phones — and each count runs on the text its own redaction
    # sees, so n_* always equals the number of tags emitted.
    # Independent counts on the raw text double-counted spans matching
    # two patterns: 'https://x.com/a@b.co' is ONE <URL> tag but was
    # counted as both an email and a URL, failing any count-vs-tag
    # audit of the scrubbed corpus.
    after_url = F.regexp_replace(c, URL_RE, "<URL>")
    after_email = F.regexp_replace(after_url, EMAIL_RE, "<EMAIL>")
    cleaned = F.regexp_replace(after_email, PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        F.regexp_count(after_url, F.lit(EMAIL_RE)).cast("long").alias(
            "n_emails"
        ),
        F.regexp_count(c, F.lit(URL_RE)).cast("long").alias("n_urls"),
        F.regexp_count(after_email, F.lit(PHONE_RE)).cast("long").alias(
            "n_phones"
        ),
        cleaned.alias("clean_text"),
        F.length(cleaned).cast("long").alias("clean_len"),
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split1",
    val_pct: int = 1,
    test_pct: int = 1,
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = md5-hash(id ||
    salt) mod 100. A document's split is a pure function of its id and
    the salt — stable across runs, engines, partitionings and corpus
    growth (new docs never move old ones between splits, unlike any
    percentile- or count-based split). Pure projection, no shuffle;
    engine-portable hash (see operators/sketches.uniform_hash60).
    """
    bucket = F.pmod(
        uniform_hash60(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
        F.lit(100),
    )
    split = (
        F.when(bucket < test_pct, "test")
        .when(bucket < test_pct + val_pct, "val")
        .otherwise("train")
    )
    return df.withColumn("bucket", bucket.cast("int")).withColumn(
        "split", split
    )


def corpus_vocab(
    df: DataFrame, text_col: str = "text", size: int = 100
) -> DataFrame:
    """Top-`size` corpus vocabulary by token frequency (ties break to
    the lexicographically smallest token — deterministic across
    engines/partitionings).

    Scale shape: explode → count is one keyed shuffle with map-side
    partial counts; the ordered LIMIT is TakeOrdered (per-partition
    top-`size`, merged on the driver) — never a global sort of the
    distinct-token set. Returns (token, freq).
    """
    toks = df.select(F.explode(tokens(text_col)).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    return counts.orderBy(F.desc("freq"), F.asc("token")).limit(size)


def oov_metrics(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Out-of-vocabulary rate per document — the vocabulary-coverage
    quality filter (a document whose tokens rarely appear in the
    corpus-wide vocabulary is likely garbled/non-target-language).

    `vocab` is a (token, ...) frame, e.g. from `corpus_vocab` — small
    by construction, so it broadcasts into the probe join. Exact
    integer counts (n_tokens, n_oov) keep the oracle bit-exact; the
    ratio is int/int division per the cross-engine rules.

    Scale: one explode (no shuffle), one broadcast LEFT join, one
    groupBy keyed on the document id.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    )
    marked = tok.join(
        F.broadcast(vocab.select("token").withColumn("__in", F.lit(1))),
        "token",
        "left",
    )
    n_tokens = F.count(F.lit(1))
    n_oov = F.sum(F.col("__in").isNull().cast("long"))
    return marked.groupBy(id_col).agg(
        n_tokens.alias("n_tokens"),
        n_oov.alias("n_oov"),
        (n_oov / F.greatest(n_tokens, F.lit(1))).alias("oov_ratio"),
    )


def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in terminal punctuation and have at least
    ``min_words`` words; drop boilerplate markers (lorem ipsum, cookie
    notices, javascript warnings); a document survives only if at least
    ``min_kept_lines`` lines remain.

    Emits (id, n_lines, n_kept_lines, clean_text, keep). Pure array
    expressions over `split(text, '\\n')` — runs inside the scan
    stage's codegen span, zero shuffles at any scale.
    """
    lines = F.split(F.col(text_col), "\n")
    word_count = lambda l: F.regexp_count(l, F.lit(r"\S+"))
    is_boiler = lambda l: (
        F.lower(l).contains("lorem ipsum")
        | F.lower(l).contains("cookie")
        | F.lower(l).contains("javascript")
    )
    good = lambda l: (
        (word_count(l) >= min_words)
        & F.trim(l).rlike(r"[.!?]$")
        & ~is_boiler(l)
    )
    base = df.select(F.col(id_col), lines.alias("__lines"))
    kept = F.filter("__lines", good)
    n_kept = F.size(kept)
    return base.select(
        F.col(id_col),
        F.size("__lines").cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
        (n_kept >= min_kept_lines).alias("keep"),
    )


def canonical_url(col: Column | str) -> Column:
    """Canonicalize a URL for dedup keying (the crawl-pipeline rule
    set): lowercase scheme+host, drop the fragment, strip utm_*
    tracking parameters, clean dangling separators. Path/query case is
    preserved (case-significant on most servers). Pure regexp
    expressions — patterns are RE2-safe (capture groups, no
    lookaround/backreference matches) so a DuckDB oracle applies the
    identical rules.
    """
    u = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    rest = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    # three passes, because a single ([?&])utm_...&? pattern CONSUMES
    # the trailing separator — the scan then resumes past the next
    # param's '&', so of adjacent utm params (the normal crawl shape:
    # utm_source&utm_medium&utm_campaign) every second one survived.
    # Pass 1 strips non-leading params (each owns its leading '&', so
    # adjacent ones are separate non-overlapping matches); passes 2-3
    # fix a leading utm param with/without a successor.
    rest = F.regexp_replace(rest, r"&utm_[^&]*", "")
    rest = F.regexp_replace(rest, r"\?utm_[^&]*&", "?")
    rest = F.regexp_replace(rest, r"\?utm_[^&]*$", "")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[?&]$", "")
    return F.when(
        scheme == "", u  # not a URL shape: pass through untouched
    ).otherwise(F.concat(scheme, F.lit("://"), host, rest))


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    n: int,
    descending: bool = True,
    tiebreaker: str | None = None,
) -> DataFrame:
    """Domain capping (C4/Gopher recipe): keep at most `n` rows per
    group, best-first by `order_col` — bounds any one domain's share of
    the corpus so boilerplate-heavy sites can't dominate training data.

    One keyed shuffle + rank window. A domain hot enough to straggle
    the window (10⁸ pages on one host) should be pre-pruned by a
    cheaper groupBy count filter first; the window then ranks only
    groups that can exceed the cap.
    """
    from pyspark.sql import Window

    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ]
    if tiebreaker:
        order.append(F.col(tiebreaker).asc())
    else:
        # row_number over a non-total order is partitioning-dependent:
        # without a tiebreaker, WHICH rows survive the cap would change
        # between runs/layouts — breaking the reproducible-sample
        # guarantee the rest of this package provides. A content hash
        # makes the order total and run-stable (Spark-side only; pass
        # an explicit id tiebreaker for cross-engine oracle parity).
        order.append(F.xxhash64(*df.columns).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= n)
        .drop("__rank")
    )


def water_fill(
    demands: DataFrame,
    key_col: str,
    demand_col: str,
    budget: int,
) -> DataFrame:
    """Water-filling budget allocation: split an integer `budget`
    across sources so that alloc_i = min(demand_i, θ) with θ chosen so
    the allocations exactly exhaust the budget (or every demand is
    met). The max-min-fair answer to "take 50B tokens from these
    sources without letting any one dominate" — small sources keep
    everything, big sources are levelled to a common cap.

    Closed form via one sort window, no iteration: sources sorted by
    ascending demand are fully funded while
    demand_k · (sources remaining) <= budget − (already funded);
    everyone after the break-point gets θ = remaining/(n−K). All
    comparisons run in exact integer arithmetic (demands and budget
    are integers); θ is the single double division, identical IEEE in
    any engine. Input is one row per source — an aggregate of the
    corpus, so the window's single-partition sort is metadata-sized
    even at 100 TB (the per-document scan happened upstream).

    Returns (key, demand, alloc double).
    """
    from pyspark.sql import Window

    w = Window.orderBy("__d", key_col)
    full = Window.partitionBy()
    ranked = demands.select(
        F.col(key_col),
        F.col(demand_col).cast("long").alias("__d"),
    ).select(
        key_col,
        "__d",
        F.row_number().over(w).alias("__k"),
        F.sum("__d").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__prefix"),
        F.count(F.lit(1)).over(full).alias("__n"),
    )
    funded = ranked.withColumn(
        "__funded",
        F.col("__d") * (F.col("__n") - F.col("__k") + 1)
        <= F.lit(int(budget)) - (F.col("__prefix") - F.col("__d")),
    )
    # break-point: last fully-funded rank and the budget it consumed
    # (0 / 0-consumed when even the smallest demand cannot be met)
    bp = funded.filter(F.col("__funded")).agg(
        F.coalesce(F.max("__k"), F.lit(0)).alias("__bk"),
        F.coalesce(F.max("__prefix"), F.lit(0)).alias("__bprefix"),
    )
    out = funded.crossJoin(F.broadcast(bp)).select(
        key_col,
        F.col("__d").alias(demand_col),
        F.when(F.col("__k") <= F.col("__bk"), F.col("__d").cast("double"))
        .otherwise(
            (F.lit(int(budget)) - F.col("__bprefix")).cast("double")
            / (F.col("__n") - F.col("__bk")).cast("double")
        )
        .alias("alloc"),
    )
    return out


def epoch_allocation(
    demands: DataFrame,
    key_col: str,
    demand_col: str,
    budget: int,
    max_epochs: int = 4,
) -> DataFrame:
    """Data-constrained token mixing (the Muennighoff 2023 "Scaling
    Data-Constrained Language Models" recipe, public): when the budget
    EXCEEDS a source's unique-token demand, the source is repeated —
    up to `max_epochs` passes, beyond which repeated data stops
    helping. Water-fill over per-source CAPACITY = demand·max_epochs
    instead of demand: small sources contribute up to max_epochs full
    epochs, large sources are levelled to a common token cap.

    Returns (key, demand, alloc double, n_full_epochs long,
    partial_tokens double): alloc = min(demand·max_epochs, θ);
    n_full_epochs = floor(alloc/demand) complete passes;
    partial_tokens = the remainder drawn from one more partial pass.
    Same determinism contract as water_fill (integer comparisons, one
    IEEE double division for θ); same scale shape (one metadata-sized
    per-source window)."""
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be positive: {max_epochs}")
    caps = demands.select(
        F.col(key_col),
        F.col(demand_col).cast("long").alias("__dem"),
        (F.col(demand_col).cast("long") * max_epochs).alias("__cap"),
    )
    wf = water_fill(caps, key_col, "__cap", budget)
    out = wf.join(
        caps.select(key_col, "__dem"), key_col
    )
    epochs = F.floor(F.col("alloc") / F.col("__dem")).cast("long")
    return out.select(
        F.col(key_col),
        F.col("__dem").alias(demand_col),
        F.col("alloc"),
        epochs.alias("n_full_epochs"),
        (F.col("alloc") - epochs * F.col("__dem")).alias(
            "partial_tokens"
        ),
    )
