"""SFT / conversation data-prep queries (operators/sft.py).

The testdata has no chat corpus, so each query synthesizes one
deterministically from `documents` (the events_cdc envelope idiom):
whitespace words sliced into 8-word turns, at most 8 turns, roles
alternating user/assistant from turn 0. The DuckDB twins replay the
synthesis AND the downstream operator exactly — every column is
integer or string arithmetic, so the whole family hash-oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.sft import (
    SFT_MAX_TURNS,
    SFT_TURN_WORDS,
    synthesize_turns,
)
from data_engineering_spark.registry import query

_W = SFT_TURN_WORDS
_T = SFT_MAX_TURNS

# the synthesized turn table, shared by every twin: slice words into
# W-word turns (≤ T), role = parity. DuckDB list slicing is 1-based
# inclusive; range(0, n) is empty when a doc has no words.
_TURNS_CTE = f"""
    ctok AS (
      SELECT doc_id AS conv_id,
             CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS t
      FROM documents),
    cti AS (
      SELECT conv_id, t,
             unnest(range(0, least((len(t) + {_W} - 1) // {_W}, {_T})))
               AS i
      FROM ctok WHERE len(t) > 0),
    cturns AS (
      SELECT conv_id, CAST(i AS INT) AS turn_idx,
             CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END
               AS role,
             array_to_string(t[i*{_W}+1 : i*{_W}+{_W}], ' ')
               AS turn_text
      FROM cti)
"""

# one ChatML block: <|im_start|>{role}\n{content}<|im_end|>\n
_BLOCK_SQL = (
    "'<|im_start|>' || role || chr(10) || turn_text "
    "|| '<|im_end|>' || chr(10)"
)


@query(
    "q_conv_turns",
    oracle=f"""
    WITH {_TURNS_CTE}
    SELECT conv_id, turn_idx, role, turn_text,
           CAST(len(string_split(turn_text, ' ')) AS INT)
             AS n_turn_words
    FROM cturns
    """,
)
def q_conv_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized role-tagged turn table itself — the family's
    input contract, verified end-to-end (zero-shuffle: tokenize →
    slice → one explode)."""
    d = load_table(spark, sf_dir, "documents")
    return synthesize_turns(d)


@query(
    "q_conv_chat_template",
    oracle=f"""
    WITH {_TURNS_CTE},
    blocks AS (
      SELECT conv_id, turn_idx, role, {_BLOCK_SQL} AS block
      FROM cturns)
    SELECT conv_id,
           string_agg(block, '' ORDER BY turn_idx) AS chat_text,
           CAST(COUNT(*) AS INT) AS n_turns,
           CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                AS INT) AS n_assistant_turns,
           CAST(length(string_agg(block, '' ORDER BY turn_idx))
                AS INT) AS n_chars
    FROM blocks GROUP BY conv_id
    """,
)
def q_conv_chat_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChatML-flattened training strings: one row per conversation
    with the special-token template applied in turn order — the
    string an SFT data loader reads. One conv-keyed shuffle."""
    from data_engineering_spark.operators.sft import (
        chat_template_flatten,
    )

    d = load_table(spark, sf_dir, "documents")
    return chat_template_flatten(synthesize_turns(d))


@query(
    "q_conv_loss_mask",
    oracle=f"""
    WITH {_TURNS_CTE},
    blocks AS (
      SELECT conv_id, turn_idx, role,
             length('<|im_start|>') + length(role) + 1 AS header_len,
             length(turn_text) AS content_len,
             length({_BLOCK_SQL}) AS block_len
      FROM cturns),
    off AS (
      SELECT conv_id, turn_idx, role, header_len, content_len,
             COALESCE(SUM(block_len) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prefix
      FROM blocks)
    SELECT conv_id, turn_idx,
           CAST(prefix + header_len AS BIGINT) AS span_start,
           CAST(prefix + header_len + content_len AS BIGINT)
             AS span_end,
           CAST(content_len AS BIGINT) AS n_mask_chars
    FROM off WHERE role = 'assistant'
    """,
)
def q_conv_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loss-mask spans: the 0-based character span of every ASSISTANT
    turn's content inside the flattened chat string — the trainer
    masks everything outside these spans (train-on-assistant-only).
    Pure integer offset arithmetic, verified against a window-sum
    replay."""
    from data_engineering_spark.operators.sft import loss_mask_spans

    d = load_table(spark, sf_dir, "documents")
    return loss_mask_spans(synthesize_turns(d))


@query(
    "q_conv_dedup",
    oracle=f"""
    WITH {_TURNS_CTE},
    norm AS (
      SELECT conv_id,
             string_agg(
               role || ':' ||
               lower(regexp_replace(trim(turn_text), '\\s+', ' ', 'g')),
               chr(31) ORDER BY turn_idx) AS k
      FROM cturns GROUP BY conv_id),
    grp AS (
      SELECT k, COUNT(*) AS n_copies, MIN(conv_id) AS canon
      FROM norm GROUP BY k)
    SELECT n.conv_id, CAST(g.n_copies AS BIGINT) AS n_copies,
           n.conv_id = g.canon AS is_canonical
    FROM norm n JOIN grp g USING (k)
    """,
)
def q_conv_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level exact dedup on the normalized turn sequence
    (role + lowercased whitespace-collapsed content, in order). Spark
    groups on a sha2 fingerprint so content never shuffles twice; the
    twin groups on the raw key string — identical classes up to
    SHA-256 collision (the operators/dedup.py contract)."""
    from data_engineering_spark.operators.sft import conversation_dedup

    d = load_table(spark, sf_dir, "documents")
    return conversation_dedup(synthesize_turns(d))


@query(
    "q_conv_preference_pairs",
    oracle=f"""
    WITH {_TURNS_CTE},
    la AS (
      SELECT conv_id, MAX(turn_idx) AS li
      FROM cturns WHERE role = 'assistant' GROUP BY 1),
    pb AS (
      SELECT c.conv_id,
             string_agg({_BLOCK_SQL}, '' ORDER BY c.turn_idx) AS ctx
      FROM cturns c JOIN la USING (conv_id)
      WHERE c.turn_idx < la.li GROUP BY 1),
    ch AS (
      SELECT t.conv_id, t.turn_text AS chosen
      FROM cturns t JOIN la
        ON t.conv_id = la.conv_id AND t.turn_idx = la.li),
    pairs AS (
      -- pb LEFT JOIN + COALESCE: when the last assistant turn is turn
      -- 0 there is no prompt prefix and pb has no group; the Spark
      -- operator keeps the conversation with a header-only prompt, so
      -- the twin must too (ADVICE r10)
      SELECT la.conv_id,
             COALESCE(pb.ctx, '') || '<|im_start|>assistant'
               || chr(10) AS prompt_text,
             ch.chosen AS chosen_text,
             array_to_string(
               list_reverse(string_split(ch.chosen, ' ')), ' ')
               AS rejected_text
      FROM la LEFT JOIN pb USING (conv_id) JOIN ch USING (conv_id))
    SELECT conv_id, prompt_text, chosen_text, rejected_text,
           CAST(length(prompt_text) AS BIGINT) AS n_prompt_chars,
           CAST(len(string_split(chosen_text, ' ')) AS INT)
             AS n_chosen_words,
           CAST(len(string_split(rejected_text, ' ')) AS INT)
             AS n_rejected_words
    FROM pairs
    """,
)
def q_conv_preference_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DPO-style preference pairs: the generation prompt (every turn
    before the LAST assistant turn + the open assistant header), the
    chosen completion, and a deterministic synthetic rejected twin
    (word order reversed — the pair STRUCTURE is what ships; a real
    second completion slots into the same column). Conversations with
    no assistant turn drop."""
    from data_engineering_spark.operators.sft import preference_pairs

    d = load_table(spark, sf_dir, "documents")
    return preference_pairs(synthesize_turns(d))


_CTX_BUDGET = 48  # context-window token budget (synthesized convs
# run ~18 BPE tokens/turn, so windows hold ~2 turns and real splitting
# happens at every sf)


def _ctx_oracle() -> str:
    return f"""
    WITH {_TURNS_CTE},
    {{fold}},
    wl AS (
      SELECT conv_id, turn_idx, n_tok,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) // {_CTX_BUDGET} AS window_id
      FROM per_turn)
    SELECT conv_id, CAST(window_id AS INT) AS window_id,
           CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(SUM(n_tok) AS BIGINT) AS window_tokens,
           CAST(MIN(turn_idx) AS INT) AS first_turn
    FROM wl GROUP BY 1, 2
    """


@query("q_conv_context_windows", oracle="__deferred__")
def q_conv_context_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Long conversations split at TURN boundaries into consecutive
    {budget}-token context windows (turns never split) — the
    context-limit preparation step before template flattening. Greedy
    running-total assignment per conversation over REAL per-turn BPE
    counts; the window partitions by conversation, so nothing grows
    with the corpus."""
    from data_engineering_spark.operators.sft import context_windows
    from data_engineering_spark.queries.classifier import _bpe_merges

    d = load_table(spark, sf_dir, "documents")
    cw = context_windows(
        synthesize_turns(d),
        _bpe_merges(spark, sf_dir),
        budget_tokens=_CTX_BUDGET,
    )
    return cw.groupBy("conv_id", "window_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("n_bpe_tokens").cast("long").alias("window_tokens"),
        F.min("turn_idx").cast("int").alias("first_turn"),
    )


def _bpe_fold_cte() -> str:
    """CTEs (m, cw, seg, encw, per_turn): the trained-BPE encode fold
    (the q_doc_bpe_encode twin, operators/bpe.bpe_segment_expr) run on
    the synthesized TURN words instead of document words."""
    from data_engineering_spark.operators.bpe import BPE_SENTINEL as _S
    from data_engineering_spark.queries._fixtures import (
        bpe_fixture_path,
        seed_bpe_fixture,
        warn_fixture_write_failed,
    )

    try:
        seed_bpe_fixture()
    except Exception as e:
        warn_fixture_write_failed("seed_bpe_fixture", e)
    return f"""
    m AS (
      SELECT COALESCE(list(pat ORDER BY idx), []) AS ms
      FROM read_parquet('{bpe_fixture_path()}')
      WHERE corpus_n = (SELECT COUNT(*) FROM documents)),
    cw AS (
      SELECT conv_id, turn_idx, role,
             unnest(string_split(turn_text, ' ')) AS word
      FROM cturns),
    seg AS (
      SELECT conv_id, turn_idx, role, word,
             CASE WHEN regexp_matches(word, '^[!-~]+$') THEN
               list_reduce(
                 list_prepend(
                   regexp_replace(word, '(.)', '{_S}\\1{_S}', 'g'),
                   (SELECT ms FROM m)),
                 (acc, p) -> replace(acc, p,
                                     replace(p, '{_S}{_S}', '')))
             END AS s
      FROM cw),
    encw AS (
      SELECT conv_id, turn_idx, role,
             CASE WHEN s IS NULL THEN 1
                  ELSE (length(s) - length(replace(s, '{_S}', ''))) // 2
             END AS n_tok
      FROM seg),
    per_turn AS (
      SELECT conv_id, turn_idx, role,
             COUNT(*) AS n_words, SUM(n_tok) AS n_tok
      FROM encw GROUP BY 1, 2, 3)
    """


@query(
    "q_conv_token_counts",
    oracle=f"""
    WITH {_TURNS_CTE},
    {_bpe_fold_cte()}
    SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN role = 'assistant' THEN n_tok ELSE 0 END)
                AS BIGINT) AS n_assistant_tokens
    FROM per_turn GROUP BY conv_id
    """,
)
def q_conv_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation REAL BPE token counts split by role —
    n_assistant_tokens is the trainable-token budget number. Reuses
    the trained merge fixture and the bpe_doc_token_counts fold on a
    composite (conv, turn) id; one (id, word) shuffle, the encode fold
    runs on distinct words only."""
    from data_engineering_spark.operators.sft import (
        conversation_token_counts,
    )
    from data_engineering_spark.queries.classifier import _bpe_merges

    d = load_table(spark, sf_dir, "documents")
    merges = _bpe_merges(spark, sf_dir)
    return conversation_token_counts(synthesize_turns(d), merges)


@query(
    "q_conv_packed_examples",
    oracle=f"""
    WITH {_TURNS_CTE},
    {_bpe_fold_cte()},
    conv AS (
      SELECT conv_id, SUM(n_tok) AS n_tokens,
             SUM(CASE WHEN role = 'assistant' THEN n_tok ELSE 0 END)
               AS n_asst
      FROM per_turn GROUP BY 1),
    per AS (
      SELECT d.lang, d.source, c.conv_id, c.n_tokens, c.n_asst
      FROM conv c JOIN documents d ON d.doc_id = c.conv_id),
    wl AS (
      SELECT lang, source, conv_id, n_tokens, n_asst,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang, source ORDER BY conv_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) // 2048 AS pack_id
      FROM per)
    SELECT lang, source, CAST(pack_id AS INT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_convs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           CAST(SUM(n_asst) AS BIGINT) AS trainable_tokens,
           MIN(conv_id) AS first_conv
    FROM wl GROUP BY 1, 2, 3
    """,
)
def q_conv_packed_examples(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conversations packed into 2048-token SFT training bins per
    (lang, source) shard — greedy running-total assignment
    (operators/text.pack_chunks) over the REAL per-conversation BPE
    counts, carrying the trainable (assistant) token mass per bin:
    the two numbers an SFT batch builder allocates by. Per-shard
    windows, so no partition grows with corpus-per-language."""
    from data_engineering_spark.operators.sft import (
        conversation_token_counts,
    )
    from data_engineering_spark.operators.text import pack_chunks
    from data_engineering_spark.queries.classifier import _bpe_merges

    d = load_table(spark, sf_dir, "documents")
    counts = conversation_token_counts(
        synthesize_turns(d), _bpe_merges(spark, sf_dir)
    ).select("conv_id", "n_tokens", "n_assistant_tokens")
    per_conv = (
        d.select(F.col("doc_id").alias("conv_id"), "lang", "source")
        .join(counts, "conv_id")
    )
    packed = pack_chunks(
        per_conv,
        budget_tokens=2048,
        partition_cols=("lang", "source"),
        order_cols=("conv_id",),
        tokens_col="n_tokens",
    )
    return packed.groupBy("lang", "source", "pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
        F.sum("n_assistant_tokens")
        .cast("long")
        .alias("trainable_tokens"),
        F.min("conv_id").alias("first_conv"),
    )


@query(
    "q_conv_lint",
    oracle=f"""
    WITH {_TURNS_CTE},
    lperturb AS (
      -- deterministic synthetic anomalies (the synthesized corpus is
      -- well-formed by construction, so the lint would be vacuous
      -- without them): conv %% 13 drops turn 1 (alternation stutter),
      -- conv %% 11 empties turn 0, conv %% 17 re-roles turn 2 as
      -- 'tool' (out-of-vocabulary role)
      SELECT conv_id, turn_idx,
             CASE WHEN conv_id % 17 = 0 AND turn_idx = 2
                  THEN 'tool' ELSE role END AS role,
             CASE WHEN conv_id % 11 = 0 AND turn_idx = 0
                  THEN '' ELSE turn_text END AS turn_text
      FROM cturns
      WHERE NOT (conv_id % 13 = 0 AND turn_idx = 1)),
    lagg AS (
      SELECT conv_id,
             list(role ORDER BY turn_idx) AS rl,
             list(CASE WHEN trim(turn_text) = '' THEN 1 ELSE 0 END
                  ORDER BY turn_idx) AS el
      FROM lperturb GROUP BY 1),
    lrep AS (
      SELECT conv_id,
             CAST(len(rl) AS INT) AS n_turns,
             CAST(len(list_filter(el, x -> x = 1)) AS INT)
               AS n_empty_turns,
             CAST(len(list_filter(rl, r ->
               r <> 'system' AND r <> 'user' AND r <> 'assistant'))
               AS INT) AS n_bad_roles,
             CAST(len(list_filter(range(1, len(rl)), i ->
               rl[i] = rl[i+1])) AS INT) AS n_alternation_breaks,
             rl[1] AS first_role,
             rl[len(rl)] AS last_role
      FROM lagg)
    SELECT conv_id, n_turns, n_empty_turns, n_bad_roles,
           n_alternation_breaks, first_role, last_role,
           (n_empty_turns = 0 AND n_bad_roles = 0
            AND n_alternation_breaks = 0
            AND first_role IN ('system', 'user')
            AND last_role = 'assistant') AS is_valid
    FROM lrep
    """,
)
def q_conv_lint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural lint over the conversation corpus — the QA pass
    before any chat-template/token-count stage (empty turns, unknown
    roles, alternation stutters, boundary roles, the composite
    is_valid flag). The synthesized corpus is well-formed, so three
    deterministic anomaly classes are injected first (dropped turn,
    emptied turn, re-roled turn) and the twin replays the same
    perturbation — the lint is checked on data that actually fails
    it."""
    from data_engineering_spark.operators.sft import conversation_lint

    d = load_table(spark, sf_dir, "documents")
    t = synthesize_turns(d)
    c, i = F.col("conv_id"), F.col("turn_idx")
    perturbed = (
        t.filter(~((c % 13 == 0) & (i == 1)))
        .withColumn(
            "turn_text",
            F.when((c % 11 == 0) & (i == 0), F.lit("")).otherwise(
                F.col("turn_text")
            ),
        )
        .withColumn(
            "role",
            F.when((c % 17 == 0) & (i == 2), F.lit("tool")).otherwise(
                F.col("role")
            ),
        )
    )
    return conversation_lint(perturbed)


def _inline_ctx_oracle() -> None:
    """Patch the deferred context-windows oracle (the fold CTEs are
    built by _bpe_fold_cte, defined above; the registration decorator
    runs before it exists in module order)."""
    from data_engineering_spark.registry import ORACLES

    ORACLES["q_conv_context_windows"] = _ctx_oracle().format(
        fold=_bpe_fold_cte()
    )


_inline_ctx_oracle()


# --------------------------------------------------------------------------
# Tool-call conversations: conv % 5 rewrites turn 1 as a JSON function
# call (q = its own first two words) and turn 2 as the role='tool'
# result; conv % 35 additionally truncates the call JSON (malformed).
# Both engines replay the synthesis, the JSON parse, and the pairing.
# --------------------------------------------------------------------------

_TOOL_CTE = f"""{_TURNS_CTE},
    tcall AS (
      SELECT conv_id, turn_idx,
             '{{"name":"search","arguments":{{"q":"' ||
               array_to_string((string_split(turn_text, ' '))[1:2], ' ')
               || '"}}}}' AS callj
      FROM cturns WHERE turn_idx = 1),
    ttool AS (
      SELECT c.conv_id, c.turn_idx,
             CASE WHEN c.conv_id % 5 = 0 AND c.turn_idx = 2
                  THEN 'tool' ELSE c.role END AS role,
             CASE
               WHEN c.conv_id % 5 = 0 AND c.turn_idx = 1 THEN
                 CASE WHEN c.conv_id % 35 = 0
                      THEN substr(k.callj, 1, length(k.callj) - 1)
                      ELSE k.callj END
               WHEN c.conv_id % 5 = 0 AND c.turn_idx = 2
                 THEN 'result: ' || (string_split(c.turn_text, ' '))[1]
               ELSE c.turn_text END AS turn_text
      FROM cturns c LEFT JOIN tcall k USING (conv_id, turn_idx))"""

_JNAME = (
    "CASE WHEN json_valid(turn_text) "
    "THEN json_extract_string(turn_text, '$.name') END"
)
_JQ = (
    "CASE WHEN json_valid(turn_text) "
    "THEN json_extract_string(turn_text, '$.arguments.q') END"
)


def _tool_perturb(t: DataFrame) -> DataFrame:
    """Apply the deterministic tool-call rewrite to a turn table
    (Spark twin of the ttool CTE; factored so the streaming-parity
    test runs the identical transform per micro-batch)."""
    c, i = F.col("conv_id"), F.col("turn_idx")
    two = F.array_join(
        F.slice(F.split(F.col("turn_text"), " "), 1, 2), " "
    )
    callj = F.concat(
        F.lit('{"name":"search","arguments":{"q":"'),
        two,
        F.lit('"}}'),
    )
    truncated = callj.substr(F.lit(1), F.length(callj) - 1)
    new_text = (
        F.when(
            (c % 5 == 0) & (i == 1),
            F.when(c % 35 == 0, truncated).otherwise(callj),
        )
        .when(
            (c % 5 == 0) & (i == 2),
            F.concat(
                F.lit("result: "),
                F.element_at(F.split(F.col("turn_text"), " "), 1),
            ),
        )
        .otherwise(F.col("turn_text"))
    )
    new_role = (
        F.when((c % 5 == 0) & (i == 2), F.lit("tool"))
        .otherwise(F.col("role"))
    )
    return t.select(
        "conv_id",
        "turn_idx",
        new_role.alias("role"),
        new_text.alias("turn_text"),
    )


def _tool_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized tool-augmented turn table."""
    d = load_table(spark, sf_dir, "documents")
    return _tool_perturb(synthesize_turns(d))


@query(
    "q_conv_tool_calls",
    oracle=f"""
    WITH {_TOOL_CTE},
    calls AS (
      SELECT conv_id, turn_idx,
             {_JNAME} AS tool_name, {_JQ} AS arg_q
      FROM ttool
      WHERE role = 'assistant' AND turn_text LIKE '{{"name"%')
    SELECT c.conv_id, c.turn_idx, c.tool_name, c.arg_q,
           (c.tool_name IS NOT NULL AND c.arg_q IS NOT NULL)
             AS is_wellformed,
           COALESCE(n.role = 'tool', FALSE) AS has_result
    FROM calls c LEFT JOIN ttool n
      ON c.conv_id = n.conv_id AND n.turn_idx = c.turn_idx + 1
    """,
)
def q_conv_tool_calls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool-call extraction: one row per function-call turn with the
    parsed name/argument, a well-formedness flag (from_json PERMISSIVE
    nulls malformed JSON — the conv%35 truncation class), and the
    call/result pairing flag. JVM from_json, one neighbor equi-join
    (operators/sft.tool_call_extract)."""
    from data_engineering_spark.operators.sft import tool_call_extract

    return tool_call_extract(_tool_turns(spark, sf_dir))


@query(
    "q_conv_tool_stats",
    oracle=f"""
    WITH {_TOOL_CTE},
    tflags AS (
      SELECT conv_id, turn_idx, role,
             (role = 'assistant' AND turn_text LIKE '{{"name"%')
               AS is_call,
             ({_JNAME} IS NOT NULL AND {_JQ} IS NOT NULL) AS wf
      FROM ttool),
    tj AS (
      SELECT f.*, n.role AS next_role, p.is_call AS prev_is_call
      FROM tflags f
      LEFT JOIN tflags n
        ON f.conv_id = n.conv_id AND n.turn_idx = f.turn_idx + 1
      LEFT JOIN tflags p
        ON f.conv_id = p.conv_id AND p.turn_idx = f.turn_idx - 1),
    tagg AS (
      SELECT conv_id,
        CAST(SUM(CASE WHEN is_call THEN 1 ELSE 0 END) AS BIGINT)
          AS n_tool_calls,
        CAST(SUM(CASE WHEN is_call AND wf THEN 1 ELSE 0 END) AS BIGINT)
          AS n_wellformed_calls,
        CAST(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_tool_results,
        CAST(SUM(CASE WHEN is_call
                       AND COALESCE(next_role = 'tool', FALSE)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_paired_calls,
        CAST(SUM(CASE WHEN role = 'tool'
                       AND NOT COALESCE(prev_is_call, FALSE)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_results
      FROM tj GROUP BY 1)
    SELECT conv_id, n_tool_calls, n_wellformed_calls, n_tool_results,
           n_paired_calls, n_orphan_results,
           (n_wellformed_calls = n_tool_calls
            AND n_paired_calls = n_tool_calls
            AND n_orphan_results = 0) AS is_valid
    FROM tagg
    """,
)
def q_conv_tool_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation tool-use accounting: call / well-formed /
    result / paired / orphan counters and the composite validity flag
    — the corpus-level QA report for function-calling SFT data
    (operators/sft.tool_call_stats; conversations without tool turns
    are trivially valid)."""
    from data_engineering_spark.operators.sft import tool_call_stats

    return tool_call_stats(_tool_turns(spark, sf_dir))


@query(
    "q_conv_tool_loss_mask",
    oracle=f"""
    WITH {_TOOL_CTE},
    tblocks AS (
      SELECT conv_id, turn_idx, role,
             length('<|im_start|>') + length(role) + 1 AS header_len,
             length(turn_text) AS content_len,
             length({_BLOCK_SQL}) AS block_len
      FROM ttool),
    toff AS (
      SELECT conv_id, turn_idx, role, header_len, content_len,
             COALESCE(SUM(block_len) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prefix
      FROM tblocks)
    SELECT conv_id, turn_idx,
           CAST(prefix + header_len AS BIGINT) AS span_start,
           CAST(prefix + header_len + content_len AS BIGINT)
             AS span_end,
           CAST(content_len AS BIGINT) AS n_mask_chars
    FROM toff WHERE role = 'assistant'
    """,
)
def q_conv_tool_loss_mask(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Loss-mask spans for TOOL-augmented conversations: the trainer
    optimizes assistant turns — which here includes the function-call
    JSON (the model must learn to EMIT calls) — while role='tool'
    result turns fall outside every span (results come from the
    environment, never the loss). Cross-family composition:
    loss_mask_spans unchanged over the tool-synthesis turn table; the
    role filter does the right thing because the call turn keeps
    role='assistant'."""
    from data_engineering_spark.operators.sft import loss_mask_spans

    return loss_mask_spans(_tool_turns(spark, sf_dir))
