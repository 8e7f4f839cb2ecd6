"""Corpus-hygiene queries: quality filters, PII scrub, splits, dedup
clusters (SURVEY.md §2.11 extension; operators/filters.py, graph.py).

Every query is DuckDB-oracle-checked. Determinism notes: all ratios
are int/int divisions or correctly-rounded double mul/div (bit-exact
across engines — registry.py policy); no transcendental functions in
emitted values (ln/log are NOT guaranteed ulp-identical across libm
implementations, so "linear idf" tf*(N/df) replaces tf*ln(N/df) where
the value is part of the checked output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.filters import (
    gopher_metrics,
    repetition_metrics,
    scrub_pii,
    split_assign,
)
from data_engineering_spark.registry import query


@query(
    "q_doc_gopher_filters",
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    m AS (
      SELECT doc_id, text,
             len(toks) AS n_tokens,
             CAST(list_sum(list_transform(toks, x -> length(x)))
                  AS BIGINT) AS char_sum,
             len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
               AS n_alpha
      FROM t)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           char_sum,
           char_sum / GREATEST(n_tokens, 1) AS mean_word_len,
           CAST(n_alpha AS BIGINT) AS n_alpha_tokens,
           n_alpha / GREATEST(n_tokens, 1) AS frac_alpha,
           regexp_matches(text, '[.!?]$') AS ends_with_punct,
           (n_tokens BETWEEN 50 AND 100000)
             AND (char_sum / GREATEST(n_tokens, 1) BETWEEN 3 AND 10)
             AND (n_alpha / GREATEST(n_tokens, 1) >= 0.8) AS keep
    FROM m
    """,
)
def q_doc_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality band (token count, mean word
    length, alpha-token fraction, terminal punctuation) + keep flag —
    one shuffle-free projection over the corpus."""
    d = load_table(spark, sf_dir, "documents")
    return gopher_metrics(d)


@query(
    "q_doc_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents),
    g AS (
      SELECT doc_id,
             GREATEST(len(t) - 2, 0) AS n_grams,
             len(list_distinct(list_transform(
                 range(1, greatest(len(t) - 1, 1)),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS n_distinct
      FROM t)
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(CASE WHEN n_grams > 0 THEN n_distinct ELSE 0 END
                AS BIGINT) AS n_distinct,
           CASE WHEN n_grams > 0 THEN 1 - n_distinct / n_grams
                ELSE CAST(0 AS DOUBLE) END AS rep_ratio
    FROM g
    """,
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher repetition filter: duplicate 3-gram mass per document
    (1 - distinct/total positional grams). Zero shuffles — both counts
    come from one token array in the scan stage."""
    d = load_table(spark, sf_dir, "documents")
    return repetition_metrics(d, n=3)


@query(
    "q_doc_pii_scrub",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             text || ' contact u' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or https://ex.org/d/'
                  || CAST(doc_id AS VARCHAR) || ' or call 555-'
                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                  || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS text
      FROM documents),
    staged AS (
      SELECT doc_id, text,
             regexp_replace(text,
                 'https?://[^ \t\n]+', '<URL>', 'g') AS after_url
      FROM base),
    staged2 AS (
      SELECT doc_id, text, after_url,
             regexp_replace(after_url,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g') AS after_email
      FROM staged),
    scrub AS (
      -- mirrors the operator: URLs redact first (an email inside a
      -- URL is part of the URL), and each count runs on the text its
      -- own redaction sees, so counts == emitted tags
      SELECT doc_id,
             len(regexp_extract_all(after_url,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
               AS n_emails,
             len(regexp_extract_all(text, 'https?://[^ \t\n]+'))
               AS n_urls,
             len(regexp_extract_all(after_email,
                 '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
             regexp_replace(after_email,
                 '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean_text
      FROM staged2)
    SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
           CAST(n_urls AS BIGINT) AS n_urls,
           CAST(n_phones AS BIGINT) AS n_phones,
           sha256(clean_text) AS clean_sha,
           CAST(length(clean_text) AS BIGINT) AS clean_len
    FROM scrub
    """,
)
def q_doc_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over documents salted with synthetic emails/URLs/
    phone numbers (deterministic per doc id, mirrored in the oracle):
    counts + redacted text verified via sha256. Pure regexp projection
    — patterns chosen to mean the same thing in Java regex and RE2."""
    d = load_table(spark, sf_dir, "documents")
    salted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or https://ex.org/d/"),
            F.col("doc_id").cast("string"),
            F.lit(" or call 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    out = scrub_pii(salted)
    return out.select(
        "doc_id",
        "n_emails",
        "n_urls",
        "n_phones",
        F.sha2("clean_text", 256).alias("clean_sha"),
        "clean_len",
    )


@query(
    "q_doc_split_assign",
    oracle="""
    WITH b AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'split1'),
              1, 15))::BIGINT % 100 AS bucket
      FROM documents)
    SELECT doc_id, lang, CAST(bucket AS INT) AS bucket,
           CASE WHEN bucket < 1 THEN 'test'
                WHEN bucket < 2 THEN 'val'
                ELSE 'train' END AS split
    FROM b
    """,
)
def q_doc_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (98/1/1): the split is a
    pure function of (doc id, salt) via the engine-portable md5 hash —
    stable under corpus growth, reruns and repartitioning. Projection
    only, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return split_assign(d.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "lang", "bucket", "split"
    )


@query(
    "q_doc_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents),
    tf AS (
      SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (
      SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.w AS term,
             CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
             tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf_lin,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) DESC,
                        tf.w ASC) AS rank
      FROM tf JOIN df ON tf.w = df.w CROSS JOIN n)
    SELECT doc_id, term, tf, df, tfidf_lin, CAST(rank AS INT) AS rank
    FROM scored WHERE rank <= 3
    """,
)
def q_doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinctive terms per document by LINEAR tf-idf
    (tf * N/df — mul/div are correctly-rounded IEEE ops, so the score
    is bit-identical across engines, unlike ln-based idf). Plan: one
    tokenize fan-out, two aggregations, a broadcast-sized df join, one
    per-doc window. The term-frequency join is the only data-sized
    shuffle — keyed on the term, exactly what a 100 TB BM25 index
    build does."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    from data_engineering_spark.operators.text import tokens

    tok = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()  # one metadata-sized action; a constant per SF
    scored = (
        tf.join(df, "term")
        .withColumn(
            "tfidf_lin",
            F.col("tf") * (F.lit(float(n_docs)) / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_lin"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "tfidf_lin",
            "rank",
        )
    )


@query(
    "q_doc_url_domains",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             text || ' via https://d' || CAST(doc_id % 50 AS VARCHAR)
                  || '.example.'
                  || CASE doc_id % 3 WHEN 0 THEN 'com'
                                     WHEN 1 THEN 'org'
                                     ELSE 'net' END
                  || '/p/' || CAST(doc_id AS VARCHAR) AS text
      FROM documents),
    d AS (
      SELECT doc_id,
             regexp_extract(text, 'https?://([^/ ]+)', 1) AS domain
      FROM b)
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM d GROUP BY 1
    """,
)
def q_doc_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level corpus statistics (the C4 domain-filtering
    primitive): extract the registrable host from each document's URL
    (synthesized deterministically per doc id in both engines), count
    docs per domain. Downstream, a blocklist join or per-domain quota
    uses exactly this frame. Regexp capture-group extraction means the
    same thing in Java regex and RE2."""
    d = load_table(spark, sf_dir, "documents")
    tld = (
        F.when(F.col("doc_id") % 3 == 0, "com")
        .when(F.col("doc_id") % 3 == 1, "org")
        .otherwise("net")
    )
    salted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" via https://d"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(".example."),
            tld,
            F.lit("/p/"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    dom = salted.select(
        "doc_id",
        F.regexp_extract("text", r"https?://([^/ ]+)", 1).alias("domain"),
    )
    return dom.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


_BM25_TERMS = ("data", "stream", "spark", "query")

# saturation term as one shared formula string: both engines build the
# same expression tree, and every op is a correctly-rounded IEEE
# mul/div/add, so identical tree => identical doubles. Constants are
# CAST(... AS DOUBLE) because DuckDB parses bare decimals as DECIMAL.
_BM25_SAT_SQL = (
    "(s.tf * (CAST(1.2 AS DOUBLE) + CAST(1 AS DOUBLE))) / "
    "(s.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + "
    "CAST(0.75 AS DOUBLE) * (s.dl / avgdl)))"
)


@query(
    "q_doc_bm25_linear",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents),
    dl AS (
      SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM tok),
    stats AS (
      SELECT CAST(SUM(len(t)) AS DOUBLE) / COUNT(*) AS avgdl,
             CAST(COUNT(*) AS DOUBLE) AS n_docs
      FROM tok),
    tf AS (
      SELECT doc_id, w AS term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest(t) AS w FROM tok)
      WHERE w IN {_BM25_TERMS}
      GROUP BY 1, 2),
    df AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT s.doc_id, s.term,
             (n_docs / df.df) * {_BM25_SAT_SQL} AS part
      FROM (SELECT tf.doc_id, tf.term, tf.tf, dl.dl
            FROM tf JOIN dl ON tf.doc_id = dl.doc_id) s
      JOIN df ON s.term = df.term
      CROSS JOIN stats),
    pivoted AS (
      SELECT doc_id,
             COALESCE(MAX(CASE WHEN term = 'data'   THEN part END),
                      CAST(0 AS DOUBLE)) AS p0,
             COALESCE(MAX(CASE WHEN term = 'stream' THEN part END),
                      CAST(0 AS DOUBLE)) AS p1,
             COALESCE(MAX(CASE WHEN term = 'spark'  THEN part END),
                      CAST(0 AS DOUBLE)) AS p2,
             COALESCE(MAX(CASE WHEN term = 'query'  THEN part END),
                      CAST(0 AS DOUBLE)) AS p3
      FROM scored GROUP BY 1),
    ranked AS (
      SELECT doc_id, ROUND(((p0 + p1) + p2) + p3, 6) AS score,
             ROW_NUMBER() OVER (
               ORDER BY ROUND(((p0 + p1) + p2) + p3, 6) DESC, doc_id)
               AS rank
      FROM pivoted)
    SELECT doc_id, score, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def q_doc_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by BM25 (k1=1.2, b=0.75) for the fixed query
    {data, stream, spark, query}, with LINEAR idf (N/df — no log: libm
    ln differs across engines in the last ulp; every op here is a
    correctly-rounded IEEE mul/div/add evaluated in an identical tree,
    so scores hash-match bit-exactly). Per-term parts are pivoted into
    fixed columns and added in a FIXED order — a groupBy SUM over terms
    would be order-nondeterministic across engines. Plan: one tokenize
    fan-out filtered to the query terms (tiny), doc-length agg, df agg,
    broadcast-sized joins, global top-10."""
    from data_engineering_spark.operators.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", tokens("text").alias("__t"))
    dl = tok.select(
        "doc_id", F.size("__t").cast("double").alias("dl")
    )
    stats = tok.agg(
        (
            F.sum(F.size("__t")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
        F.count(F.lit(1)).cast("double").alias("n_docs"),
    )
    words = tok.select(
        "doc_id", F.explode("__t").alias("term")
    ).filter(F.col("term").isin(*_BM25_TERMS))
    tf = words.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    k1, one = F.lit(1.2), F.lit(1.0)
    quarter, b = F.lit(0.25), F.lit(0.75)
    s = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
    )
    sat = (F.col("tf") * (k1 + one)) / (
        F.col("tf")
        + k1 * (quarter + b * (F.col("dl") / F.col("avgdl")))
    )
    part = (F.col("n_docs") / F.col("df")) * sat
    scored = s.select("doc_id", "term", part.alias("part"))
    zero = F.lit(0.0)
    pivoted = scored.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("part"))), zero
            ).alias(f"p{i}")
            for i, t in enumerate(_BM25_TERMS)
        ]
    )
    # ROUND(.,6): the per-part arithmetic is last-ulp sensitive to FMA
    # contraction differences between engines (measured: 2/10 docs off
    # by one ulp at ~8.0); 6 decimals is 9 orders of magnitude above
    # that noise and far below score granularity — same precedent as
    # cosine_r in the similarity queries
    score = F.round(
        ((F.col("p0") + F.col("p1")) + F.col("p2")) + F.col("p3"), 6
    )
    # Top-10 as orderBy().limit(): plans as TakeOrderedAndProject —
    # each task keeps its local top-10 and the driver merges — instead
    # of a row_number window with an empty partition spec, which moves
    # EVERY matching doc to one partition for a single-task sort (the
    # r6 verdict's scale-killer).  rank is then stamped on the ≤10-row
    # result with a bounded self-join (rank = 1 + strictly-better
    # rows): deterministic, no window, no single-partition exchange.
    # The twin TakeOrdered subtrees share their upstream shuffles via
    # ReusedExchange, so the corpus is still scanned once.
    top = (
        pivoted.withColumn("score", score)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )
    better = (F.col("b.score") > F.col("a.score")) | (
        (F.col("b.score") == F.col("a.score"))
        & (F.col("b.doc_id") < F.col("a.doc_id"))
    )
    j = (
        top.alias("a")
        .join(F.broadcast(top.alias("b")), better, "left")
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.score").alias("score"),
            F.col("b.doc_id").alias("__b"),
        )
    )
    return j.groupBy("doc_id", "score").agg(
        (F.count("__b") + 1).cast("int").alias("rank")
    )


# the exact-jaccard pair list (same SQL as q_doc_ngram_jaccard_pairs'
# oracle) feeding the recursive-CTE transitive closure
_PAIRS_CTE = """
    tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM tok),
    inv AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n AS na, b.n AS nb, COUNT(*) AS common
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    dup AS (
      SELECT doc_a, doc_b FROM pairs
      WHERE common * 1.0 / (na + nb - common) >= 0.6)
"""


@query(
    "q_doc_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTE},
    ed AS (
      SELECT doc_a AS u, doc_b AS v FROM dup
      UNION SELECT doc_b, doc_a FROM dup),
    reach(u, v) AS (
      SELECT u, v FROM ed
      UNION
      SELECT r.u, e.v FROM reach r JOIN ed e ON r.v = e.u),
    comp AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
      FROM reach GROUP BY u),
    sizes AS (
      SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
    SELECT c.doc_id, c.cluster_id,
           CAST(s.cluster_size AS BIGINT) AS cluster_size,
           c.doc_id = c.cluster_id AS is_canonical
    FROM comp c JOIN sizes s USING (cluster_id)
    """,
)
def q_doc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS → dedup CLUSTERS: iterative min-label propagation
    (operators/graph.connected_components) over the exact-jaccard pair
    graph; the oracle recomputes the same components with a recursive
    CTE. cluster_id = min doc id in the component; is_canonical marks
    the keeper. The iterative loop runs over the pair list (tiny vs the
    corpus); per-round actions are metadata-sized."""
    from data_engineering_spark.operators.graph import dedup_clusters
    from data_engineering_spark.operators.text import ngram_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    # lazy pairs (release_cache=False): connected_components checkpoints
    # the edge set once, so the pair pipeline executes a single time per
    # run, and its internal inv0/cands persists carry across repeated
    # runs in one session (eager release would rebuild them every call —
    # measured 2.5x slower steady-state). Long-lived pipelines that must
    # not accumulate cache call the operator directly with release_cache.
    pairs = ngram_jaccard_pairs(d, threshold=0.6)
    # the pair list is distinct + canonical by construction — skip
    # CC's union+distinct shuffle (operators/graph.py edges_unique)
    return dedup_clusters(pairs, edges_unique=True)


@query(
    "q_doc_domain_cap",
    oracle="""
    SELECT doc_id, source, lang, n_chars
    FROM (
      SELECT doc_id, source, lang, n_chars,
             row_number() OVER (
               PARTITION BY source, lang
               ORDER BY n_chars DESC, doc_id ASC
             ) AS rn
      FROM documents)
    WHERE rn <= 5
    ORDER BY source, lang, n_chars DESC, doc_id
    """,
)
def q_doc_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping: at most 5 docs per (source, lang), longest
    first with a doc_id tiebreaker (total order — the LIMIT rule of
    registry.py). The C4-style bound on any one domain's corpus
    share."""
    from data_engineering_spark.operators.filters import cap_per_group

    d = load_table(spark, sf_dir, "documents")
    capped = cap_per_group(
        d.select("doc_id", "source", "lang", "n_chars"),
        ["source", "lang"],
        "n_chars",
        5,
        tiebreaker="doc_id",
    )
    return capped


@query(
    "q_doc_oov_rate",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents),
    counts AS (
      SELECT token, COUNT(*) AS freq FROM tok GROUP BY token),
    vocab AS (
      SELECT token FROM counts ORDER BY freq DESC, token ASC LIMIT 25),
    per AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM tok t LEFT JOIN vocab v ON t.token = v.token
      GROUP BY t.doc_id)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_oov AS BIGINT) AS n_oov,
           n_oov / GREATEST(n_tokens, 1) AS oov_ratio
    FROM per
    """,
)
def q_doc_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage filter: top-25 corpus vocabulary (frequency
    desc, token asc — deterministic ties), then each document's exact
    out-of-vocabulary token count and ratio. The vocab is TakeOrdered
    (never a global sort) and broadcasts into the probe join; counts
    are exact integers so the oracle comparison is bit-exact."""
    from data_engineering_spark.operators.filters import (
        corpus_vocab,
        oov_metrics,
    )

    d = load_table(spark, sf_dir, "documents")
    vocab = corpus_vocab(d, "text", size=25)
    return oov_metrics(d, vocab, "doc_id", "text")


@query(
    "q_doc_c4_lines",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    lined AS (
      SELECT doc_id,
             array_to_string(
               list_transform(
                 range(CAST(ceil(len(toks)/8.0) AS BIGINT)),
                 i -> array_to_string(toks[(i*8+1):((i+1)*8)], ' ')
                      || CASE WHEN i % 2 = 0 THEN '.' ELSE '' END),
               chr(10)) AS text
      FROM t),
    f AS (
      SELECT doc_id,
             string_split(text, chr(10)) AS ls
      FROM lined),
    k AS (
      SELECT doc_id, ls,
             list_filter(ls, l ->
               len(regexp_extract_all(l, '\\S+')) >= 5
               AND regexp_matches(trim(l), '[.!?]$')
               AND NOT contains(lower(l), 'lorem ipsum')
               AND NOT contains(lower(l), 'cookie')
               AND NOT contains(lower(l), 'javascript')) AS kept
      FROM f)
    SELECT doc_id,
           CAST(len(ls) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept_lines,
           sha256(array_to_string(kept, chr(10))) AS clean_sha,
           len(kept) >= 3 AS keep
    FROM k
    """,
)
def q_doc_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning over line-structured text: documents are
    deterministically re-lined (8 tokens per line, every other line
    given terminal punctuation — mirrored exactly in the oracle), then
    the Raffel et al. §2.2 rules apply: >=5 words, terminal
    punctuation, no boilerplate markers, >=3 surviving lines. Rebuilt
    text verified by sha256; the whole query is scan-stage array math
    with zero shuffles."""
    from data_engineering_spark.operators.filters import c4_line_filter

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_lines = F.ceil(F.size(toks) / F.lit(8)).cast("int")
    lined = d.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_lines, F.lit(1)) - 1),
                lambda i: F.concat(
                    F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
                    F.when(i % 2 == 0, F.lit(".")).otherwise(F.lit("")),
                ),
            ),
            "\n",
        ).alias("text"),
    )
    out = c4_line_filter(lined, "doc_id", "text")
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        F.sha2("clean_text", 256).alias("clean_sha"),
        "keep",
    )


@query(
    "q_doc_length_outliers",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n
      FROM documents),
    dist AS (SELECT n, COUNT(*) AS c FROM t GROUP BY n),
    tot AS (SELECT SUM(c) AS total FROM dist),
    cum AS (
      SELECT n, SUM(c) OVER (ORDER BY n) AS cm, total
      FROM dist, tot),
    f AS (
      SELECT MIN(CASE WHEN 4 * cm >= total THEN n END) AS q1,
             MIN(CASE WHEN 4 * cm >= 3 * total THEN n END) AS q3
      FROM cum)
    SELECT t.doc_id, CAST(t.n AS BIGINT) AS n_tokens,
           CAST(f.q1 AS BIGINT) AS q1, CAST(f.q3 AS BIGINT) AS q3,
           (2 * t.n < 2 * f.q1 - 3 * (f.q3 - f.q1)
            OR 2 * t.n > 2 * f.q3 + 3 * (f.q3 - f.q1)) AS is_outlier
    FROM t, f
    """,
)
def q_doc_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence length-outlier flags with EXACT discrete quartiles:
    q1/q3 are the smallest token counts whose cumulative frequency
    reaches 1/4 and 3/4 of the corpus (integer comparisons — no
    interpolation, whose index arithmetic differs between engines),
    and the 1.5·IQR fences are evaluated as 2n < 2q1 − 3(q3−q1) so
    everything stays integral. The quantile pass runs over the token-
    count DISTRIBUTION (distinct lengths — tiny at any corpus size),
    never a global sort of documents; fences broadcast back."""
    from pyspark.sql import Window

    from data_engineering_spark.operators.text import token_count

    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", token_count("text").alias("n"))
    dist = t.groupBy("n").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, 0)
    cum = dist.withColumn("cm", F.sum("c").over(w)).withColumn(
        "total", F.sum("c").over(Window.partitionBy())
    )
    fences = cum.select(
        F.min(F.when(4 * F.col("cm") >= F.col("total"), F.col("n"))).alias(
            "q1"
        ),
        F.min(
            F.when(4 * F.col("cm") >= 3 * F.col("total"), F.col("n"))
        ).alias("q3"),
    )
    iqr3 = 3 * (F.col("q3") - F.col("q1"))
    return t.crossJoin(F.broadcast(fences)).select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("q1").cast("long").alias("q1"),
        F.col("q3").cast("long").alias("q3"),
        (
            (2 * F.col("n") < 2 * F.col("q1") - iqr3)
            | (2 * F.col("n") > 2 * F.col("q3") + iqr3)
        ).alias("is_outlier"),
    )


@query(
    "q_doc_url_canonical",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'HTTPS://WWW.Site' || CAST(doc_id % 7 AS VARCHAR)
             || '.COM/Article/' || CAST(doc_id AS VARCHAR)
             || '?utm_source=feed&utm_medium=m' || CAST(doc_id % 5 AS VARCHAR)
             || '&ref=' || CAST(doc_id % 13 AS VARCHAR)
             || '&utm_campaign=x#section-' || CAST(doc_id % 3 AS VARCHAR)
               AS url
      FROM documents),
    c AS (
      SELECT doc_id, url,
             lower(regexp_extract(url,
                 '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host,
             regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(
                 regexp_extract(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1),
                 '&utm_[^&]*', '', 'g'),
                 '\\?utm_[^&]*&', '?', 'g'),
                 '\\?utm_[^&]*$', '', 'g'),
                 '\\?&', '?', 'g'),
                 '[?&]$', '', 'g') AS rest
      FROM u)
    SELECT doc_id, url,
           scheme || '://' || host || rest AS canonical,
           COUNT(*) OVER (PARTITION BY scheme || '://' || host || rest)
             > 1 AS shares_canonical
    FROM c
    """,
)
def q_doc_url_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization for crawl dedup: deterministic synthetic
    URLs (mixed-case host, utm_* tracking params, fragments) are
    canonicalized — lowercase scheme+host, tracking params stripped,
    fragment dropped, path case preserved — and flagged when multiple
    raw URLs collapse to one canonical key. RE2-safe regex rules,
    identical in both engines."""
    from data_engineering_spark.operators.filters import canonical_url
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW.Site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".COM/Article/"),
            F.col("doc_id").cast("string"),
            F.lit("?utm_source=feed&utm_medium=m"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("&ref="),
            (F.col("doc_id") % 13).cast("string"),
            F.lit("&utm_campaign=x#section-"),
            (F.col("doc_id") % 3).cast("string"),
        ).alias("url"),
    )
    c = u.withColumn("canonical", canonical_url("url"))
    w = Window.partitionBy("canonical")
    return c.select(
        "doc_id",
        "url",
        "canonical",
        (F.count(F.lit(1)).over(w) > 1).alias("shares_canonical"),
    )


@query(
    "q_doc_normalize",
    oracle="""
    WITH salted AS (
      SELECT doc_id,
             '  Caf' || chr(233) || '  ' || text || '   THE  END...  '
               AS raw
      FROM documents),
    n AS (
      SELECT doc_id, raw,
             trim(regexp_replace(regexp_replace(regexp_replace(
                 translate(lower(raw),
                           chr(224)||chr(225)||chr(232)||chr(233)
                           ||chr(236)||chr(237)||chr(242)||chr(243)
                           ||chr(249)||chr(250), 'aaeeiioouu'),
                 '[^ -~]', '', 'g'),
                 '[.]{2,}', '.', 'g'),
                 '[ '||chr(9)||chr(10)||chr(13)||']+', ' ', 'g'))
               AS clean
      FROM salted)
    SELECT doc_id,
           CAST(length(raw) AS BIGINT) AS raw_len,
           CAST(length(clean) AS BIGINT) AS clean_len,
           sha256(clean) AS clean_sha
    FROM n
    """,
)
def q_doc_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-normalization battery (corpus cleaning pass): lowercase,
    fold common accented vowels, strip non-printable/non-ASCII,
    collapse ellipsis runs, collapse whitespace, trim — applied to
    documents salted with messy affixes (accents, double spaces,
    trailing '...'), sha256-verified. One shuffle-free projection;
    every rule is an RE2-safe regexp or translate, identical across
    engines."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("  Café  "), F.col("text"), F.lit("   THE  END...  ")
    )
    accents = "àáèéìíòóùú"
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.translate(F.lower(raw), accents, "aaeeiioouu"),
                    r"[^ -~]",
                    "",
                ),
                r"[.]{2,}",
                ".",
            ),
            "[ \t\n\r]+",
            " ",
        )
    )
    return d.select(
        "doc_id",
        F.length(raw).cast("long").alias("raw_len"),
        F.length(clean).cast("long").alias("clean_len"),
        F.sha2(clean, 256).alias("clean_sha"),
    )


@query(
    "q_doc_split_by_cluster",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTE},
    ed AS (
      SELECT doc_a AS u, doc_b AS v FROM dup
      UNION SELECT doc_b, doc_a FROM dup),
    reach(u, v) AS (
      SELECT u, v FROM ed
      UNION
      SELECT r.u, e.v FROM reach r JOIN ed e ON r.v = e.u),
    comp AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
      FROM reach GROUP BY u),
    rep AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS rep_id
      FROM documents d LEFT JOIN comp c USING (doc_id)),
    b AS (
      SELECT doc_id, rep_id,
             ('0x' || substr(md5(CAST(rep_id AS VARCHAR) || 'csplit1'),
              1, 15))::BIGINT % 100 AS bucket
      FROM rep)
    SELECT doc_id, rep_id,
           CASE WHEN bucket < 5 THEN 'test'
                WHEN bucket < 10 THEN 'val'
                ELSE 'train' END AS split
    FROM b
    """,
)
def q_split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: near-duplicate documents must
    land in the SAME split (a test doc's near-copy in train is silent
    eval contamination), so the split hash keys on the document's
    dedup-cluster representative — min doc id of its connected
    component (operators/graph), the doc itself when unclustered —
    instead of the doc id. Same deterministic md5 bucketing as
    q_doc_split_assign, one extra left join against the (tiny)
    cluster-label frame."""
    from data_engineering_spark.operators.graph import (
        connected_components,
    )
    from data_engineering_spark.operators.sketches import uniform_hash60
    from data_engineering_spark.operators.text import ngram_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d.select("doc_id", "text"), n=3, threshold=0.6
    )
    comp = connected_components(
        pairs, "doc_a", "doc_b", edges_unique=True
    )
    rep = d.select("doc_id").join(
        comp.select(
            F.col("vertex").alias("doc_id"),
            F.col("component").alias("__c"),
        ),
        "doc_id",
        "left",
    ).select(
        "doc_id", F.coalesce("__c", "doc_id").alias("rep_id")
    )
    bucket = (
        uniform_hash60(
            F.concat(F.col("rep_id").cast("string"), F.lit("csplit1"))
        )
        % 100
    )
    return rep.select(
        "doc_id",
        "rep_id",
        F.when(bucket < 5, "test")
        .when(bucket < 10, "val")
        .otherwise("train")
        .alias("split"),
    )


@query(
    "q_doc_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTE},
    ed AS (
      SELECT doc_a AS u, doc_b AS v FROM dup
      UNION SELECT doc_b, doc_a FROM dup),
    reach(u, v) AS (
      SELECT u, v FROM ed
      UNION
      SELECT r.u, e.v FROM reach r JOIN ed e ON r.v = e.u),
    comp AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
      FROM reach GROUP BY u),
    member AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
             d.n_chars
      FROM documents d LEFT JOIN comp c USING (doc_id)),
    ranked AS (
      SELECT doc_id, cluster_id,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
               ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM member)
    SELECT doc_id, cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size
    FROM ranked WHERE rn = 1
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: within each near-dup cluster
    keep the BEST document (longest here — swap in any quality score),
    not the arbitrary min-id. min-id canonicals (q_doc_dedup_clusters)
    are fine for identity; for a training corpus you want the richest
    member to survive. One window over the cluster-labeled frame with
    a deterministic (score, id) total order; singletons are their own
    cluster via the left join + coalesce."""
    from data_engineering_spark.operators.graph import (
        connected_components,
    )
    from data_engineering_spark.operators.text import ngram_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d.select("doc_id", "text"), n=3, threshold=0.6
    )
    comp = connected_components(
        pairs, "doc_a", "doc_b", edges_unique=True
    )
    member = d.select("doc_id", "n_chars").join(
        comp.select(
            F.col("vertex").alias("doc_id"),
            F.col("component").alias("__c"),
        ),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        F.coalesce("__c", "doc_id").alias("cluster_id"),
        "n_chars",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ws = Window.partitionBy("cluster_id")
    return (
        member.select(
            "doc_id",
            "cluster_id",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(ws).cast("long").alias("cluster_size"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "q_doc_source_budget",
    oracle="""
    WITH d AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS demand
      FROM documents GROUP BY 1),
    r AS (
      SELECT source, demand,
             ROW_NUMBER() OVER (ORDER BY demand, source) AS k,
             SUM(demand) OVER (ORDER BY demand, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx,
             COUNT(*) OVER () AS n
      FROM d),
    f AS (
      SELECT *, demand * (n - k + 1) <= 100000 - (pfx - demand) AS funded
      FROM r),
    bp AS (
      SELECT COALESCE(MAX(k), 0) AS bk, COALESCE(MAX(pfx), 0) AS bpfx
      FROM f WHERE funded)
    SELECT source, demand,
           CASE WHEN k <= bk THEN CAST(demand AS DOUBLE)
                ELSE CAST(100000 - bpfx AS DOUBLE)
                     / CAST(n - bk AS DOUBLE) END AS alloc
    FROM f, bp ORDER BY source
    """,
)
def q_doc_source_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling character budget across sources (100k chars):
    small sources keep their full demand, large sources are levelled
    to a common cap that exactly exhausts the budget — max-min-fair
    corpus mixing. Exact integer window arithmetic up to the single
    theta division, so the oracle matches bit-for-bit."""
    from data_engineering_spark.operators.filters import water_fill

    d = load_table(spark, sf_dir, "documents")
    demands = d.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("demand")
    )
    return water_fill(demands, "source", "demand", budget=100_000)
