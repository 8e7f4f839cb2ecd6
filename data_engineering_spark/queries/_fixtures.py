"""Oracle fixture files for model-parameterized queries.

Some operators are deterministic but parameterized by values that are
impractical to inline in an oracle SQL string: the LSH random
hyperplanes (4096 doubles) and the PCA model (data-dependent — it
cannot be a literal at registration time at all). The DuckDB oracle
instead JOINS a tiny parquet fixture:

- `lsh_planes_fixture()` — static given (seed, bands, planes, dim):
  written idempotently at registration time from the same numpy RNG
  call the operator makes, so oracle order never matters.
- PCA — keyed by corpus row count (each scale factor has a distinct
  count, so one fixture file serves every sf with a static SQL
  string). Pre-seeded at registration with an independently numpy-fit
  model (so an oracle-first harness still works) and overwritten with
  the engine-fit model when the Spark query runs (so the usual
  spark-then-oracle order compares the REAL model's projection).
  Model coefficients are rounded at 1e-9 — far below any meaningful
  precision, but it makes the fit reproducible across partial-sum
  orders so the two fits agree exactly.

Fixtures live under /tmp (they are derived, rewritable artifacts, not
repo state); paths encode the parameters.

KNOWN LIMIT of the corpus_n key (measured r8): corpus row count is
NOT unique across test corpora — sf0.001 and sf0.01 both carry 500
documents and 500 embeddings with DIFFERENT content. The parquet
model fixtures stay correct anyway because every harness in this repo
is spark-then-oracle PER QUERY: the Spark side retrains and
overwrites the colliding key's rows immediately before the oracle
reads them (drive_contract, check_queries, test_oracle_parity, the
driver — all verified green at every sf for 8 rounds). What the
collision DOES break is any artifact that is built once and never
overwritten — the r8 IVF-PQ index directory hit exactly this and is
therefore keyed by (source-path slug, n), see
queries/similarity._ivfpq_encoded_fixture. An oracle-FIRST replay at
a colliding sf would read the other corpus's registration pre-seed;
if such a harness ever appears, move these keys to a content
fingerprint (e.g. corpus_n * 10^9 + SUM(n_chars)) in the same motion
on both sides.
"""

from __future__ import annotations

import os

import numpy as np

FIXTURE_DIR = "/tmp/spark_graft_fixtures"

_LSH_BANDS, _LSH_PLANES_PER_BAND, _LSH_DIM, _LSH_SEED = 16, 5, 64, 42
_PCA_K = 8
_PCA_TESTDATA_SFS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


def _write_parquet(path: str, table) -> None:
    import pyarrow.parquet as pq

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)  # atomic: concurrent writers converge


def warn_fixture_write_failed(what: str, exc: Exception) -> None:
    """Fixture writes are oracle support, never a query failure — the
    callers swallow the exception so a read-only replay environment
    still runs the Spark side. But the swallow must be LOUD (ADVICE
    r7): if the fixture can't be written, the query runs with one set
    of model parameters while the oracle reads another (or none), and
    the resulting hash mismatch two stages later masquerades as a
    query bug. One UserWarning at write time makes it attributable."""
    import warnings

    warnings.warn(
        f"oracle fixture write failed ({what}): {exc!r} — a later "
        "oracle mismatch on the dependent queries is attributable to "
        "THIS, not to the query",
        UserWarning,
        stacklevel=3,
    )


def lsh_planes_fixture() -> str:
    """Rows (band, plane, d, w): hyperplane coefficient for dimension
    `d` (1-based) of plane `plane` (bit weight 2^plane) in `band` —
    exactly `rng.standard_normal((bands, planes, dim))` as the
    operator draws it (operators/similarity.lsh_bucketed_similarity_join)."""
    import pyarrow as pa

    path = os.path.join(
        FIXTURE_DIR,
        f"lsh_planes_b{_LSH_BANDS}r{_LSH_PLANES_PER_BAND}"
        f"d{_LSH_DIM}s{_LSH_SEED}.parquet",
    )
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(_LSH_SEED)
    planes = rng.standard_normal(
        (_LSH_BANDS, _LSH_PLANES_PER_BAND, _LSH_DIM)
    )
    band, plane, d, w = [], [], [], []
    for b in range(_LSH_BANDS):
        for p in range(_LSH_PLANES_PER_BAND):
            for i in range(_LSH_DIM):
                band.append(b)
                plane.append(p)
                d.append(i + 1)
                w.append(float(planes[b, p, i]))
    _write_parquet(
        path,
        pa.table(
            {"band": band, "plane": plane, "d": d, "w": w},
            schema=pa.schema(
                [
                    ("band", pa.int32()),
                    ("plane", pa.int32()),
                    ("d", pa.int32()),
                    ("w", pa.float64()),
                ]
            ),
        ),
    )
    return path


def pca_fixture_path() -> str:
    return os.path.join(FIXTURE_DIR, f"pca_model_k{_PCA_K}.parquet")


def _round9(x: float) -> float:
    return float(np.floor(x * 1e9 + 0.5) / 1e9)


def round9_model(mean, comps):
    """Quantize model parameters at 1e-9 — far below meaningful
    precision, but it makes independently-computed fits (Spark
    partial-sum order vs local numpy) agree bit-for-bit, so the oracle
    join key is stable."""
    return (
        np.array([_round9(float(v)) for v in mean]),
        np.array([[_round9(float(v)) for v in row] for row in comps]),
    )


def pca_model_rows(
    mean: np.ndarray, comps: np.ndarray, corpus_n: int, k_out: int = 2
) -> list[tuple[int, int, int, float]]:
    """Fixture rows (corpus_n, j, d, w) for components 1..k_out of an
    ALREADY-round9ed model: d >= 1 is the coefficient for dimension d;
    d = 0 carries the exact `-mean·c_j` constant computed with the SAME
    np.dot call pca_project folds into its literal — so the oracle
    evaluates the identical `-offset + Σ x_d·w_d` the codegen
    projection does."""
    rows = []
    for j in range(k_out):
        c = comps[j]
        offset = float(np.dot(np.asarray(mean), np.asarray(c)))
        rows.append((corpus_n, j + 1, 0, -offset))
        for i, w in enumerate(c):
            rows.append((corpus_n, j + 1, i + 1, float(w)))
    return rows


def write_pca_fixture(new_rows, corpus_n: int) -> str:
    return _merge_keyed_rows(pca_fixture_path(), new_rows, corpus_n)


def _merge_keyed_rows(path: str, new_rows, corpus_n: int) -> str:
    """Merge `new_rows` (corpus_n, j, d, w) into the fixture, replacing
    any prior rows for the same corpus_n (other scale factors' entries
    survive)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    keep = []
    if os.path.exists(path):
        t = pq.read_table(path)
        keep = [
            tuple(r)
            for r in zip(*[t[c].to_pylist() for c in ("corpus_n", "j", "d", "w")])
            if r[0] != corpus_n
        ]
    allr = keep + list(new_rows)
    cols = list(zip(*allr)) if allr else [[], [], [], []]
    _write_parquet(
        path,
        pa.table(
            {
                "corpus_n": list(cols[0]),
                "j": list(cols[1]),
                "d": list(cols[2]),
                "w": list(cols[3]),
            },
            schema=pa.schema(
                [
                    ("corpus_n", pa.int64()),
                    ("j", pa.int32()),
                    ("d", pa.int32()),
                    ("w", pa.float64()),
                ]
            ),
        ),
    )
    return path


# ---------------------------------------------------------------------------
# IVF coarse quantizer — deterministic training shared by the Spark
# query (collects the SAME stride sample) and the registration-time
# fixture seeding (pyarrow read), so the centroid fixture is identical
# no matter which side writes it first.
# ---------------------------------------------------------------------------

IVF_CLUSTERS, IVF_SEED, IVF_ITERS, IVF_SAMPLE_CAP = 16, 42, 20, 32768


def ivf_fixture_path() -> str:
    return os.path.join(
        FIXTURE_DIR, f"ivf_centroids_k{IVF_CLUSTERS}.parquet"
    )


def ivf_sample_stride(corpus_n: int) -> int:
    return max(1, -(-corpus_n // IVF_SAMPLE_CAP))


def ivf_train_centroids(x: np.ndarray) -> np.ndarray:
    """Deterministic coarse quantizer: the repo's numpy k-means
    (operators/pq._lloyd) on the stride sample, rows in vec_id order.
    Same input matrix => bit-identical centroids on both paths."""
    from data_engineering_spark.operators.pq import _lloyd

    rng = np.random.default_rng(IVF_SEED)
    return _lloyd(
        np.ascontiguousarray(x, dtype=np.float64), IVF_CLUSTERS, IVF_ITERS, rng
    )


def ivf_centroid_rows(cents: np.ndarray, corpus_n: int):
    return [
        (corpus_n, int(c) + 1, i + 1, float(w))
        for c in range(len(cents))
        for i, w in enumerate(cents[c])
    ]


def write_ivf_fixture(cents: np.ndarray, corpus_n: int) -> str:
    return _merge_keyed_rows(
        ivf_fixture_path(), ivf_centroid_rows(cents, corpus_n), corpus_n
    )


def _stride_sample_matrix(sf_dir: str):
    """(sample_matrix float64, corpus_n) for one sf dir — rows with
    vec_id % stride == 0, ascending vec_id. The pyarrow twin of the
    Spark-side collection in queries/similarity; both must produce the
    SAME matrix for the fixtures to be order-independent."""
    import pyarrow.parquet as pq

    emb = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(emb):
        return None, 0
    t = pq.read_table(emb, columns=["vec_id", "embedding"])
    n = len(t)
    if n == 0:
        return None, 0
    ids = np.asarray(t["vec_id"].to_pylist())
    order = np.argsort(ids, kind="stable")
    flat = t["embedding"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    x = flat.astype(np.float64).reshape(n, -1)[order]
    stride = ivf_sample_stride(n)
    return x[ids[order] % stride == 0], n


def seed_ivf_fixture() -> str:
    """Pre-seed IVF centroids for every testdata sf (pyarrow path —
    identical arithmetic to the query-side training)."""
    import pyarrow.parquet as pq

    path = ivf_fixture_path()
    have = set()
    if os.path.exists(path):
        have = set(pq.read_table(path)["corpus_n"].to_pylist())
    for sf_dir in _PCA_TESTDATA_SFS:
        sample, n = _stride_sample_matrix(sf_dir)
        if sample is None or n in have:
            continue
        write_ivf_fixture(ivf_train_centroids(sample), n)
        have.add(n)
    return path


# ---------------------------------------------------------------------------
# PQ codebooks — same shared-deterministic-training contract as IVF.
# ---------------------------------------------------------------------------

PQ_M, PQ_K_CODES, PQ_SEED, PQ_ITERS = 16, 64, 42, 15


def pq_fixture_path() -> str:
    return os.path.join(
        FIXTURE_DIR, f"pq_codebooks_m{PQ_M}k{PQ_K_CODES}.parquet"
    )


def pq_train_sample(x: np.ndarray) -> np.ndarray:
    from data_engineering_spark.operators.pq import pq_train_matrix

    return pq_train_matrix(x, PQ_M, PQ_K_CODES, PQ_SEED, PQ_ITERS)


def pq_codebook_rows(cb: np.ndarray, corpus_n: int):
    """(corpus_n, j, d, w): j encodes (sub, code) as sub*k + code + 1;
    d is the GLOBAL dimension index sub*dsub + local + 1, so the
    oracle joins straight against the unnested embedding."""
    m, k, dsub = cb.shape
    return [
        (corpus_n, sub * k + code + 1, sub * dsub + i + 1, float(w))
        for sub in range(m)
        for code in range(k)
        for i, w in enumerate(cb[sub, code])
    ]


def write_pq_fixture(cb: np.ndarray, corpus_n: int) -> str:
    return _merge_keyed_rows(
        pq_fixture_path(), pq_codebook_rows(cb, corpus_n), corpus_n
    )


def seed_pq_fixture() -> str:
    import pyarrow.parquet as pq

    path = pq_fixture_path()
    have = set()
    if os.path.exists(path):
        have = set(pq.read_table(path)["corpus_n"].to_pylist())
    for sf_dir in _PCA_TESTDATA_SFS:
        sample, n = _stride_sample_matrix(sf_dir)
        if sample is None or n in have:
            continue
        write_pq_fixture(pq_train_sample(sample), n)
        have.add(n)
    return path


def _numpy_pca(x: np.ndarray, k: int):
    """Mirror of operators/pca.pca_fit numerics on a local matrix:
    covariance from Gram + mean, eigh, descending order, deterministic
    sign (largest-|coeff| entry positive)."""
    n = len(x)
    mean = x.sum(axis=0) / n
    cov = (x.T @ x) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps


def seed_pca_fixture() -> str:
    """Pre-seed the PCA fixture for every testdata scale factor with an
    independently-fit numpy model, so an oracle that runs before the
    Spark query still has parameters to join. Idempotent; cheap (the
    biggest corpus is ~150k × 64 floats)."""
    import pyarrow.parquet as pq

    path = pca_fixture_path()
    have = set()
    if os.path.exists(path):
        have = set(pq.read_table(path)["corpus_n"].to_pylist())
    for sf_dir in _PCA_TESTDATA_SFS:
        emb = os.path.join(sf_dir, "embeddings.parquet")
        if not os.path.exists(emb):
            continue
        t = pq.read_table(emb, columns=["embedding"])
        n = len(t)
        if n == 0 or n in have:
            continue
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        x = flat.astype(np.float64).reshape(n, -1)
        mean, comps = round9_model(*_numpy_pca(x, _PCA_K))
        write_pca_fixture(pca_model_rows(mean, comps, n), n)
        have.add(n)
    return path


# ---------------------------------------------------------------------------
# BPE merge list — the trained tokenizer model shared by the Spark
# encode queries and their DuckDB oracles.  Keyed by documents-table
# row count (distinct per scale factor, same convention as PCA/IVF).
# Pre-seeded from a DuckDB word count + the SAME pure-python greedy
# merge loop bpe_train runs (operators/bpe.bpe_merge_loop), so whichever
# side writes first, the parameters are identical.  The fixture stores
# the sentinel-wrapped replace PATTERNS in training order — all either
# engine needs to run the full encode fold.
# ---------------------------------------------------------------------------

BPE_NUM_MERGES = 100


def bpe_fixture_path() -> str:
    return os.path.join(
        FIXTURE_DIR, f"bpe_merges_m{BPE_NUM_MERGES}.parquet"
    )


def _bpe_word_freqs_duckdb(sf_dir: str):
    """(word, freq) vocabulary + documents row count via DuckDB —
    the tokenize twin of operators/bpe.word_frequencies (trim →
    whitespace split → printable-ASCII filter)."""
    import duckdb

    doc = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(doc):
        return None, 0
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{doc}'"
    ).fetchone()[0]
    rows = con.execute(
        f"""
        WITH t AS (
          SELECT CASE WHEN length(trim(text)) = 0 THEN []
                 ELSE string_split_regex(trim(text), '\\s+') END AS t
          FROM '{doc}'),
        w AS (SELECT unnest(t) AS word FROM t)
        SELECT word, COUNT(*) AS freq FROM w
        WHERE regexp_matches(word, '^[!-~]+$')
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    return [(w, int(f)) for w, f in rows], int(n)


def write_bpe_fixture(patterns: list, corpus_n: int) -> str:
    """Merge `patterns` (training order) into the fixture under key
    corpus_n, replacing prior rows for the same key."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = bpe_fixture_path()
    keep = []
    if os.path.exists(path):
        t = pq.read_table(path)
        keep = [
            r
            for r in zip(
                t["corpus_n"].to_pylist(),
                t["idx"].to_pylist(),
                t["pat"].to_pylist(),
            )
            if r[0] != corpus_n
        ]
    allr = keep + [
        (corpus_n, i, p) for i, p in enumerate(patterns)
    ]
    cols = list(zip(*allr)) if allr else [[], [], []]
    _write_parquet(
        path,
        pa.table(
            {
                "corpus_n": list(cols[0]),
                "idx": list(cols[1]),
                "pat": list(cols[2]),
            },
            schema=pa.schema(
                [
                    ("corpus_n", pa.int64()),
                    ("idx", pa.int32()),
                    ("pat", pa.string()),
                ]
            ),
        ),
    )
    return path


WP_NUM_MERGES = 24  # few enough that the 31-word synthetic corpus
#                     stays MULTI-piece (28/31 words, mean fertility
#                     3.6) so the ##-continuation path is genuinely
#                     exercised cross-engine; at 100 merges every
#                     word collapses to a single piece


def wordpiece_fixture_path() -> str:
    return os.path.join(
        FIXTURE_DIR, f"wordpiece_pieces_m{WP_NUM_MERGES}.parquet"
    )


def write_wordpiece_fixture(pieces: list, corpus_n: int) -> str:
    """Piece list (training order) into the fixture under key
    corpus_n, replacing prior rows for the same key."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = wordpiece_fixture_path()
    keep = []
    if os.path.exists(path):
        t = pq.read_table(path)
        keep = [
            r
            for r in zip(
                t["corpus_n"].to_pylist(),
                t["idx"].to_pylist(),
                t["piece"].to_pylist(),
            )
            if r[0] != corpus_n
        ]
    allr = keep + [(corpus_n, i, p) for i, p in enumerate(pieces)]
    cols = list(zip(*allr)) if allr else [[], [], []]
    _write_parquet(
        path,
        pa.table(
            {
                "corpus_n": list(cols[0]),
                "idx": list(cols[1]),
                "piece": list(cols[2]),
            },
            schema=pa.schema(
                [
                    ("corpus_n", pa.int64()),
                    ("idx", pa.int32()),
                    ("piece", pa.string()),
                ]
            ),
        ),
    )
    return path


def read_wordpiece_fixture(corpus_n: int) -> list | None:
    """Pieces in training order for corpus_n, or None if unseeded."""
    import pyarrow.parquet as pq

    path = wordpiece_fixture_path()
    if not os.path.exists(path):
        return None
    t = pq.read_table(path)
    rows = sorted(
        (i, p)
        for cn, i, p in zip(
            t["corpus_n"].to_pylist(),
            t["idx"].to_pylist(),
            t["piece"].to_pylist(),
        )
        if cn == corpus_n
    )
    return [p for _, p in rows] if rows else None


def seed_wordpiece_fixture() -> str:
    """Pre-seed the WordPiece piece list for every testdata sf
    (DuckDB word count + the exact wordpiece_merge_loop the Spark
    trainer runs) — same convention as seed_bpe_fixture."""
    import pyarrow.parquet as pq

    from data_engineering_spark.operators.wordpiece import (
        wordpiece_merge_loop,
    )

    path = wordpiece_fixture_path()
    have = set()
    if os.path.exists(path):
        have = set(pq.read_table(path)["corpus_n"].to_pylist())
    for sf_dir in _PCA_TESTDATA_SFS:
        vocab, n = _bpe_word_freqs_duckdb(sf_dir)
        if vocab is None or n in have:
            continue
        pieces = wordpiece_merge_loop(vocab, WP_NUM_MERGES)
        write_wordpiece_fixture(pieces, n)
        have.add(n)
    return path


UG_VOCAB_SIZE = 48  # singles (~24 chars in the synthetic corpus) +
#                     ~24 multi-char pieces: words stay multi-piece
#                     (measured fertility 2.29) so the Viterbi DP is
#                     genuinely exercised cross-engine — the same
#                     sizing rationale as WP_NUM_MERGES
UG_MAX_PIECE_LEN = 4


def unigram_fixture_path() -> str:
    return os.path.join(
        FIXTURE_DIR,
        f"unigram_scores_v{UG_VOCAB_SIZE}p{UG_MAX_PIECE_LEN}.parquet",
    )


def write_unigram_fixture(
    piece_scores: list, corpus_n: int
) -> str:
    """(piece, integer nano-nat score) rows into the fixture under key
    corpus_n, replacing prior rows for the same key."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = unigram_fixture_path()
    keep = []
    if os.path.exists(path):
        t = pq.read_table(path)
        keep = [
            r
            for r in zip(
                t["corpus_n"].to_pylist(),
                t["piece"].to_pylist(),
                t["score"].to_pylist(),
            )
            if r[0] != corpus_n
        ]
    allr = keep + [(corpus_n, p, s) for p, s in piece_scores]
    cols = list(zip(*allr)) if allr else [[], [], []]
    _write_parquet(
        path,
        pa.table(
            {
                "corpus_n": list(cols[0]),
                "piece": list(cols[1]),
                "score": list(cols[2]),
            },
            schema=pa.schema(
                [
                    ("corpus_n", pa.int64()),
                    ("piece", pa.string()),
                    ("score", pa.int64()),
                ]
            ),
        ),
    )
    return path


def read_unigram_fixture(corpus_n: int) -> list | None:
    """[(piece, score_int)] sorted by piece for corpus_n, or None."""
    import pyarrow.parquet as pq

    path = unigram_fixture_path()
    if not os.path.exists(path):
        return None
    rows = sorted(
        (p, s)
        for cn, p, s in zip(
            *[
                pq.read_table(path)[c].to_pylist()
                for c in ("corpus_n", "piece", "score")
            ]
        )
        if cn == corpus_n
    )
    return rows or None


def seed_unigram_fixture() -> str:
    """Pre-seed the unigram-LM (piece, score) model for every testdata
    sf (DuckDB word count + the exact unigram_em_loop the Spark
    trainer runs) — same convention as seed_bpe_fixture."""
    import pyarrow.parquet as pq

    from data_engineering_spark.operators.unigram import (
        unigram_em_loop,
    )

    path = unigram_fixture_path()
    have = set()
    if os.path.exists(path):
        have = set(pq.read_table(path)["corpus_n"].to_pylist())
    for sf_dir in _PCA_TESTDATA_SFS:
        vocab, n = _bpe_word_freqs_duckdb(sf_dir)
        if vocab is None or n in have:
            continue
        write_unigram_fixture(
            unigram_em_loop(
                vocab,
                vocab_size=UG_VOCAB_SIZE,
                max_piece_len=UG_MAX_PIECE_LEN,
            ),
            n,
        )
        have.add(n)
    return path


def read_bpe_fixture(corpus_n: int) -> list | None:
    """Patterns in training order for corpus_n, or None if unseeded."""
    import pyarrow.parquet as pq

    path = bpe_fixture_path()
    if not os.path.exists(path):
        return None
    t = pq.read_table(path)
    rows = sorted(
        (i, p)
        for cn, i, p in zip(
            t["corpus_n"].to_pylist(),
            t["idx"].to_pylist(),
            t["pat"].to_pylist(),
        )
        if cn == corpus_n
    )
    return [p for _, p in rows] if rows else None


def seed_bpe_fixture() -> str:
    """Pre-seed the merge list for every testdata sf (DuckDB word
    count + the exact bpe_merge_loop the Spark trainer runs)."""
    import pyarrow.parquet as pq

    from data_engineering_spark.operators.bpe import (
        bpe_merge_loop,
        merge_patterns,
    )

    path = bpe_fixture_path()
    have = set()
    if os.path.exists(path):
        have = set(pq.read_table(path)["corpus_n"].to_pylist())
    for sf_dir in _PCA_TESTDATA_SFS:
        vocab, n = _bpe_word_freqs_duckdb(sf_dir)
        if vocab is None or n in have:
            continue
        merges = bpe_merge_loop(vocab, BPE_NUM_MERGES)
        write_bpe_fixture(merge_patterns(merges), n)
        have.add(n)
    return path


# ---------------------------------------------------------------------------
# Bigram-LM quantized log-probs — the nano-nat tables that upgrade
# q_doc_lm_perplexity from rows-only to a full hash oracle (VERDICT
# r10 #3a).  The LM's integer counts are already engine-reproducible
# (md5 buckets, proven by q_doc_lm_bigram_stats); the only
# non-portable step was ln().  Exactly as operators/unigram.py does
# for Viterbi scores, the logs are computed ONCE in pure python and
# quantized to integer nano-nats: per-bucket
#     q12 = round(ln(c + 1)·1e9)      (joint numerator)
#     q1  = round(ln(c + B)·1e9)      (context denominator)
# so per-document nll_nano = Σ(q1 − q12) is an exact int64 both
# engines replay bit-identically.  Keyed by documents row count, same
# convention as the PCA/IVF/BPE fixtures.
# ---------------------------------------------------------------------------

LM_NUM_BUCKETS = 8192  # matches queries/classifier._LMB


def lm_nano(x: float) -> int:
    """Nano-nat quantization: round-half-up at 1e-9 (the UG_SCORE_SCALE
    rule from operators/unigram.py)."""
    import math

    return int(math.floor(math.log(x) * 1e9 + 0.5))


def lm_q1_floor(num_buckets: int = LM_NUM_BUCKETS) -> int:
    """q1 for a context bucket absent from the LM: ln(0 + B) nano-nats
    — a python-computed literal both engines embed (missing joint
    buckets need no constant: ln(0 + 1) = 0 exactly)."""
    return lm_nano(float(num_buckets))


def lm_logq_fixture_path() -> str:
    return os.path.join(
        FIXTURE_DIR, f"lm_logq_b{LM_NUM_BUCKETS}.parquet"
    )


def _lm_bucket_counts_duckdb(sf_dir: str):
    """((bucket, c) rows over the ENGLISH slice, documents row count)
    via DuckDB — the tokenize/md5 twin of train_bigram_lm(bucket_hash=
    'md5') that q_doc_lm_bigram_stats' oracle already proves equal."""
    import duckdb

    doc = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(doc):
        return None, 0
    con = duckdb.connect()
    n = con.execute(f"SELECT COUNT(*) FROM '{doc}'").fetchone()[0]
    rows = con.execute(
        f"""
        WITH ltok AS (
          SELECT lang,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE string_split_regex(trim(text), '\\s+')
                 END AS t
          FROM '{doc}'),
        tfeat AS (
          SELECT unnest(t) AS f FROM ltok WHERE lang = 'en'
          UNION ALL
          SELECT unnest(list_transform(range(1, len(t)),
                        i -> t[i] || ' ' || t[i+1])) AS f
          FROM ltok WHERE lang = 'en')
        SELECT ('0x' || substr(md5(f), 1, 15))::BIGINT
                 % {LM_NUM_BUCKETS} AS bucket,
               COUNT(*) AS c
        FROM tfeat GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    return [(int(b), int(c)) for b, c in rows], int(n)


def write_lm_logq_fixture(rows: list, corpus_n: int) -> str:
    """Merge (bucket, q12, q1) rows into the fixture under key
    corpus_n, replacing prior rows for the same key."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = lm_logq_fixture_path()
    keep = []
    if os.path.exists(path):
        t = pq.read_table(path)
        keep = [
            r
            for r in zip(
                t["corpus_n"].to_pylist(),
                t["bucket"].to_pylist(),
                t["q12"].to_pylist(),
                t["q1"].to_pylist(),
            )
            if r[0] != corpus_n
        ]
    allr = keep + [(corpus_n, b, q12, q1) for b, q12, q1 in rows]
    cols = list(zip(*allr)) if allr else [[], [], [], []]
    _write_parquet(
        path,
        pa.table(
            {
                "corpus_n": list(cols[0]),
                "bucket": list(cols[1]),
                "q12": list(cols[2]),
                "q1": list(cols[3]),
            },
            schema=pa.schema(
                [
                    ("corpus_n", pa.int64()),
                    ("bucket", pa.int64()),
                    ("q12", pa.int64()),
                    ("q1", pa.int64()),
                ]
            ),
        ),
    )
    return path


def read_lm_logq_fixture(corpus_n: int):
    """[(bucket, q12, q1)] for one corpus key, or None if unseeded."""
    import pyarrow.parquet as pq

    path = lm_logq_fixture_path()
    if not os.path.exists(path):
        return None
    t = pq.read_table(path)
    rows = sorted(
        (b, q12, q1)
        for cn, b, q12, q1 in zip(
            t["corpus_n"].to_pylist(),
            t["bucket"].to_pylist(),
            t["q12"].to_pylist(),
            t["q1"].to_pylist(),
        )
        if cn == corpus_n
    )
    return rows if rows else None


def seed_lm_logq_fixture() -> str:
    """Pre-seed the quantized-log LM for every testdata sf (DuckDB
    bucket counts + python ln — one source of transcendentals)."""
    import pyarrow.parquet as pq

    path = lm_logq_fixture_path()
    have = set()
    if os.path.exists(path):
        have = set(pq.read_table(path)["corpus_n"].to_pylist())
    for sf_dir in _PCA_TESTDATA_SFS:
        counts, n = _lm_bucket_counts_duckdb(sf_dir)
        if counts is None or n in have:
            continue
        rows = [
            (b, lm_nano(c + 1.0), lm_nano(c + float(LM_NUM_BUCKETS)))
            for b, c in counts
        ]
        write_lm_logq_fixture(rows, n)
        have.add(n)
    return path
