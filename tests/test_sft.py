"""SFT / conversation data-prep operator tests (operators/sft.py).

The oracle matrix verifies the registered queries end-to-end against
DuckDB; these tests pin the operator semantics on hand-built inputs —
exact turn slicing, the ChatML template string byte-for-byte, the
loss-mask invariant (slicing the flattened string by the emitted spans
reproduces exactly the assistant contents), dedup normalization, and
the token-count rollup against an independent python fold.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_spark.operators.sft import (
    CHAT_BOT,
    CHAT_EOT,
    CHAT_NL,
    chat_template_flatten,
    conversation_dedup,
    conversation_token_counts,
    loss_mask_spans,
    synthesize_turns,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 10 words -> turns of 4: [4, 4, 2] with turn_words=4
        (1, "a b c d e f g h i j"),
        (2, "one two"),  # single 2-word turn
        (3, "   "),  # no words -> no conversation
        (4, ""),  # empty -> no conversation
        # 30 words, turn_words=4, max_turns=3 -> truncated to 12 words
        (5, " ".join(f"w{i}" for i in range(30))),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_synthesize_turns_slicing(spark, docs):
    out = synthesize_turns(docs, turn_words=4, max_turns=3)
    rows = {
        (r.conv_id, r.turn_idx): r for r in out.collect()
    }
    assert rows[(1, 0)].turn_text == "a b c d"
    assert rows[(1, 0)].role == "user"
    assert rows[(1, 1)].turn_text == "e f g h"
    assert rows[(1, 1)].role == "assistant"
    assert rows[(1, 2)].turn_text == "i j"
    assert rows[(1, 2)].n_turn_words == 2
    assert rows[(2, 0)].turn_text == "one two"
    # doc 3/4: no words, no rows
    assert not any(cid in (3, 4) for cid, _ in rows)
    # doc 5: truncated at max_turns
    assert max(i for cid, i in rows if cid == 5) == 2
    assert rows[(5, 2)].turn_text == "w8 w9 w10 w11"


def test_synthesize_turns_validation(docs):
    with pytest.raises(ValueError):
        synthesize_turns(docs, turn_words=0)
    with pytest.raises(ValueError):
        synthesize_turns(docs, max_turns=0)


def test_chat_template_exact_string(spark, docs):
    out = chat_template_flatten(
        synthesize_turns(docs, turn_words=4, max_turns=3)
    )
    got = {r.conv_id: r for r in out.collect()}
    expect1 = (
        f"{CHAT_BOT}user{CHAT_NL}a b c d{CHAT_EOT}"
        f"{CHAT_BOT}assistant{CHAT_NL}e f g h{CHAT_EOT}"
        f"{CHAT_BOT}user{CHAT_NL}i j{CHAT_EOT}"
    )
    assert got[1].chat_text == expect1
    assert got[1].n_turns == 3
    assert got[1].n_assistant_turns == 1
    assert got[1].n_chars == len(expect1)
    assert got[2].n_turns == 1
    assert got[2].n_assistant_turns == 0


def test_loss_mask_spans_slice_invariant(spark, docs):
    """The defining property: chat_text[start:end] == the assistant
    turn's content, for every emitted span."""
    turns = synthesize_turns(docs, turn_words=4, max_turns=3)
    chat = {
        r.conv_id: r.chat_text
        for r in chat_template_flatten(turns).collect()
    }
    texts = {
        (r.conv_id, r.turn_idx): r.turn_text for r in turns.collect()
    }
    spans = loss_mask_spans(turns).collect()
    assert spans, "fixture must produce at least one assistant turn"
    for r in spans:
        assert (
            chat[r.conv_id][r.span_start : r.span_end]
            == texts[(r.conv_id, r.turn_idx)]
        )
        assert r.n_mask_chars == r.span_end - r.span_start


def test_loss_mask_role_selection(spark, docs):
    turns = synthesize_turns(docs, turn_words=4, max_turns=3)
    got = {
        (r.conv_id, r.turn_idx)
        for r in loss_mask_spans(turns).collect()
    }
    assert got == {(1, 1), (5, 1)}  # odd turn indexes = assistant
    got_user = {
        (r.conv_id, r.turn_idx)
        for r in loss_mask_spans(turns, mask_role="user").collect()
    }
    assert (1, 0) in got_user and (2, 0) in got_user


def test_conversation_dedup_normalization(spark):
    rows = [
        (10, 0, "user", "Hello There"),
        (10, 1, "assistant", "general kenobi"),
        (11, 0, "user", "hello   there"),  # case+spacing variant
        (11, 1, "assistant", "GENERAL KENOBI"),
        (12, 0, "user", "hello there"),
        (12, 1, "assistant", "something else"),
    ]
    turns = spark.createDataFrame(
        rows, ["conv_id", "turn_idx", "role", "turn_text"]
    )
    got = {r.conv_id: r for r in conversation_dedup(turns).collect()}
    assert got[10].n_copies == 2 and got[10].is_canonical
    assert got[11].n_copies == 2 and not got[11].is_canonical
    assert got[12].n_copies == 1 and got[12].is_canonical


def test_conversation_dedup_role_matters(spark):
    """Same contents under different roles are NOT copies."""
    rows = [
        (1, 0, "user", "x"),
        (1, 1, "assistant", "y"),
        (2, 0, "assistant", "x"),
        (2, 1, "user", "y"),
    ]
    turns = spark.createDataFrame(
        rows, ["conv_id", "turn_idx", "role", "turn_text"]
    )
    got = {r.conv_id: r for r in conversation_dedup(turns).collect()}
    assert got[1].n_copies == 1 and got[2].n_copies == 1


def _py_bpe_count(word: str, merges) -> int:
    """Reference token count: merges applied sequentially, each pass
    replacing non-overlapping pairs left to right (the Sennrich
    apply_bpe semantics the JVM sentinel fold implements). Fixture
    words are printable ASCII, so the UNK branch never fires."""
    sym = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return len(sym)


def test_conversation_token_counts_python_twin(spark, docs):
    """Rollup equals an independent python BPE fold per turn."""
    merges = [("a", "b"), ("c", "d"), ("w", "1")]
    turns = synthesize_turns(docs, turn_words=4, max_turns=3)
    got = {
        r.conv_id: r
        for r in conversation_token_counts(
            turns, merges, max_turns=3
        ).collect()
    }
    expect: dict[int, dict[str, int]] = {}
    for t in turns.collect():
        e = expect.setdefault(
            t.conv_id,
            {"n_turns": 0, "n_words": 0, "n_tokens": 0, "n_asst": 0},
        )
        words = t.turn_text.split(" ")
        n_tok = sum(_py_bpe_count(w, merges) for w in words)
        e["n_turns"] += 1
        e["n_words"] += len(words)
        e["n_tokens"] += n_tok
        if t.role == "assistant":
            e["n_asst"] += n_tok
    assert set(got) == set(expect)
    for cid, e in expect.items():
        assert got[cid].n_turns == e["n_turns"], cid
        assert got[cid].n_words == e["n_words"], cid
        assert got[cid].n_tokens == e["n_tokens"], cid
        assert got[cid].n_assistant_tokens == e["n_asst"], cid


def test_conversation_token_counts_validation(spark, docs):
    with pytest.raises(ValueError):
        conversation_token_counts(
            synthesize_turns(docs), [], max_turns=0
        )


def test_turn_idx_out_of_stride_fails_loudly(spark):
    """ADVICE r10: a turn_idx >= the composite stride must raise, not
    silently fold token counts into the wrong conversation."""
    from data_engineering_spark.operators.sft import turn_token_counts

    turns = spark.createDataFrame(
        [(1, 0, "user", "aa bb"), (1, 5, "assistant", "cc dd")],
        "conv_id long, turn_idx long, role string, turn_text string",
    )
    with pytest.raises(Exception, match="turn_idx out of"):
        turn_token_counts(turns, [], max_turns=3).collect()


def test_non_numeric_conv_id_rejected_at_plan_time(spark):
    """ADVICE r10: a string conv_id would silently null the composite
    id and drop rows — reject it from the schema before any job."""
    from data_engineering_spark.operators.sft import turn_token_counts

    turns = spark.createDataFrame(
        [("c1", 0, "user", "aa bb")],
        "conv_id string, turn_idx long, role string, turn_text string",
    )
    with pytest.raises(TypeError, match="must be numeric"):
        turn_token_counts(turns, [], max_turns=3)


def test_composite_decode_exact_at_64bit_ids(spark):
    """ADVICE r10: floor(double/width) loses integer precision near
    2^53; the `div` decode must stay exact for large conv ids."""
    from data_engineering_spark.operators.sft import turn_token_counts

    big = (1 << 53) + 1111  # not representable after *9 in a double
    turns = spark.createDataFrame(
        [(big, 0, "user", "aa"), (big, 1, "assistant", "bb cc")],
        "conv_id long, turn_idx long, role string, turn_text string",
    )
    rows = {
        (r.conv_id, r.turn_idx): r.n_words
        for r in turn_token_counts(turns, [], max_turns=3).collect()
    }
    assert rows == {(big, 0): 1, (big, 1): 2}


def test_turns_plan_is_shuffle_free(spark, docs):
    from data_engineering_spark.plans.explain import plan_string

    assert "Exchange" not in plan_string(
        synthesize_turns(docs, turn_words=4, max_turns=3)
    )


def test_preference_pairs_semantics(spark, docs):
    from data_engineering_spark.operators.sft import preference_pairs

    turns = synthesize_turns(docs, turn_words=4, max_turns=3)
    got = {r.conv_id: r for r in preference_pairs(turns).collect()}
    # doc 2 has a single user turn -> no assistant turn -> dropped
    assert 2 not in got
    # doc 1: turns u/a/u, last assistant = turn 1; prompt = turn 0's
    # block + the open assistant header
    p1 = got[1]
    assert p1.prompt_text == (
        f"{CHAT_BOT}user{CHAT_NL}a b c d{CHAT_EOT}"
        f"{CHAT_BOT}assistant{CHAT_NL}"
    )
    assert p1.chosen_text == "e f g h"
    assert p1.rejected_text == "h g f e"
    assert p1.n_prompt_chars == len(p1.prompt_text)
    assert p1.n_chosen_words == 4 and p1.n_rejected_words == 4
    # rejected is a permutation of chosen (same multiset of words)
    for r in got.values():
        assert sorted(r.chosen_text.split(" ")) == sorted(
            r.rejected_text.split(" ")
        )


def test_context_windows_semantics(spark):
    """Turn-boundary splitting: windows are consecutive runs of whole
    turns; a window only exceeds the budget when a SINGLE turn does
    (the documented pack_chunks overflow rule)."""
    from data_engineering_spark.operators.sft import context_windows

    merges: list = []  # no merges -> n_bpe_tokens == word length... no:
    # with an empty merge list every char is one token, so token count
    # per turn == number of characters in its words; use that to build
    # exact expectations
    rows = [
        # conv 1: per-turn tokens 4, 4, 4, 4 with budget 8 -> windows
        # [0,1], [2,3]
        (1, 0, "user", "ab cd"),
        (1, 1, "assistant", "ef gh"),
        (1, 2, "user", "ij kl"),
        (1, 3, "assistant", "mn op"),
        # conv 2: one over-budget turn (10 tokens) occupies its own
        # window between two small ones
        (2, 0, "user", "ab"),
        (2, 1, "assistant", "abcdefghij"),
        (2, 2, "user", "cd"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, turn_text string"
    )
    got = {
        (r.conv_id, r.turn_idx): r.window_id
        for r in context_windows(
            turns, merges, budget_tokens=8, max_turns=4
        ).collect()
    }
    assert got == {
        (1, 0): 0, (1, 1): 0, (1, 2): 1, (1, 3): 1,
        (2, 0): 0, (2, 1): 0, (2, 2): 1,
    }
    # conv 2 window 0 holds 2+10=12 tokens: the over-budget turn rides
    # with the small turn before it (floor(cum_prior/budget) rule),
    # and the NEXT turn starts a fresh window — turns never split
    with pytest.raises(ValueError):
        context_windows(turns, merges, budget_tokens=0)


# ---- property tests (random turn tables, not just the synthesizer) --


def _conversations_strategy():
    """st: list of conversations, each a list of (role, text) turns —
    arbitrary roles/content within a printable+accents alphabet that
    stresses the normalization (case, inner runs of whitespace)."""
    from hypothesis import strategies as st

    turn = st.tuples(
        st.sampled_from(["user", "assistant", "system"]),
        st.text(alphabet="ab YZ.:é", max_size=8),
    )
    return st.lists(
        st.lists(turn, min_size=1, max_size=6), min_size=1, max_size=5
    )


def _turns_df(spark, convs):
    rows = [
        (cid, idx, role, text)
        for cid, turns in enumerate(convs)
        for idx, (role, text) in enumerate(turns)
    ]
    return spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, turn_text string"
    )


def test_prop_loss_mask_slice_invariant(spark):
    """For ANY turn table: every emitted span slices the flattened
    string back to exactly that turn's content, spans are disjoint and
    ordered, and exactly the mask_role turns are emitted."""
    from hypothesis import given, settings

    @given(_conversations_strategy())
    @settings(max_examples=5, deadline=None)
    def check(convs):
        turns = _turns_df(spark, convs)
        chat = {
            r.conv_id: r.chat_text
            for r in chat_template_flatten(turns).collect()
        }
        spans: dict[int, list] = {}
        for r in loss_mask_spans(turns).collect():
            spans.setdefault(r.conv_id, []).append(r)
        for cid, turns_list in enumerate(convs):
            want = [
                (i, t) for i, (role, t) in enumerate(turns_list)
                if role == "assistant"
            ]
            got = sorted(
                spans.get(cid, []), key=lambda r: r.turn_idx
            )
            assert [(r.turn_idx) for r in got] == [i for i, _ in want]
            prev_end = -1
            for r, (_, text) in zip(got, want):
                assert chat[cid][r.span_start : r.span_end] == text
                assert r.span_start > prev_end
                prev_end = r.span_end

    check()


def test_prop_dedup_matches_python_model(spark):
    """conversation_dedup equals the obvious python model (normalized
    (role, content) sequence classes; canonical = min conv_id) on ANY
    turn table, and is invariant to input row order."""
    import re

    from hypothesis import given, settings

    @given(_conversations_strategy())
    @settings(max_examples=5, deadline=None)
    def check(convs):
        def key(turns_list):
            return tuple(
                (role, re.sub(r"\s+", " ", text.strip()).lower())
                for role, text in turns_list
            )

        classes: dict[tuple, list[int]] = {}
        for cid, t in enumerate(convs):
            classes.setdefault(key(t), []).append(cid)
        want = {}
        for members in classes.values():
            canon = min(members)
            for cid in members:
                want[cid] = (len(members), cid == canon)

        turns = _turns_df(spark, convs)
        got = {
            r.conv_id: (r.n_copies, r.is_canonical)
            for r in conversation_dedup(turns).collect()
        }
        assert got == want
        # input row order must not matter (collect_list is
        # partition-order-dependent; array_sort restores determinism)
        shuffled = turns.orderBy(F.desc("turn_idx"), F.asc("conv_id"))
        got2 = {
            r.conv_id: (r.n_copies, r.is_canonical)
            for r in conversation_dedup(shuffled).collect()
        }
        assert got2 == want

    check()


def test_chat_flatten_stream_equals_batch(spark, tmp_path):
    """Each conversation derives from ONE document row, so the
    synthesize → flatten composition never splits a conversation
    across micro-batches: the streaming wiring (file source +
    checkpointed foreachBatch) must reproduce the batch transform
    exactly, whatever the slicing — chat templates can be built
    exactly-once on a streaming ingest."""
    from data_engineering_spark.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "src")
    d.filter(F.col("doc_id") % 2 == 0).write.parquet(
        src, mode="overwrite"
    )
    d.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
    got: list = []

    def sink(batch_df, _bid):
        got.extend(
            chat_template_flatten(synthesize_turns(batch_df)).collect()
        )

    q = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = {
        r["conv_id"]: (r["chat_text"], r["n_turns"])
        for r in chat_template_flatten(synthesize_turns(d)).collect()
    }
    assert {
        r["conv_id"]: (r["chat_text"], r["n_turns"]) for r in got
    } == batch
    assert len(got) == len(batch)


def test_conversation_lint_semantics(spark):
    """Hand-built anomalies → exact expected lint rows."""
    from data_engineering_spark.operators.sft import conversation_lint

    turns = spark.createDataFrame(
        [
            # conv 1: well-formed user/assistant pair
            (1, 0, "user", "hi there"),
            (1, 1, "assistant", "hello"),
            # conv 2: alternation stutter (user,user) + ends on user
            (2, 0, "user", "a"),
            (2, 1, "user", "b"),
            # conv 3: empty turn + unknown role, ends assistant
            (3, 0, "user", "   "),
            (3, 1, "tool", "x"),
            (3, 2, "assistant", "y"),
            # conv 4: system opener is valid
            (4, 0, "system", "be nice"),
            (4, 1, "user", "q"),
            (4, 2, "assistant", "a"),
            # conv 5: single assistant turn (starts wrong)
            (5, 0, "assistant", "z"),
        ],
        "conv_id long, turn_idx long, role string, turn_text string",
    )
    got = {r.conv_id: r for r in conversation_lint(turns).collect()}
    assert got[1].is_valid and got[4].is_valid
    r2 = got[2]
    assert (r2.n_alternation_breaks, r2.last_role, r2.is_valid) == (
        1, "user", False,
    )
    r3 = got[3]
    assert (r3.n_empty_turns, r3.n_bad_roles, r3.is_valid) == (
        1, 1, False,
    )
    r5 = got[5]
    assert (r5.n_turns, r5.first_role, r5.is_valid) == (
        1, "assistant", False,
    )
    # breaks fold degenerates cleanly on 1-turn convs
    assert r5.n_alternation_breaks == 0


def test_tool_call_extract_and_stats(spark):
    """Hand-built tool conversations: wellformed paired call, call
    with no result (ends conversation), malformed call, and an orphan
    result with no preceding call."""
    from data_engineering_spark.operators.sft import (
        tool_call_extract,
        tool_call_stats,
    )

    good = '{"name":"search","arguments":{"q":"spark join"}}'
    turns = spark.createDataFrame(
        [
            # conv 1: valid call/result sandwich
            (1, 0, "user", "find it"),
            (1, 1, "assistant", good),
            (1, 2, "tool", "result: spark"),
            (1, 3, "assistant", "here you go"),
            # conv 2: call with NO result (unpaired)
            (2, 0, "user", "go"),
            (2, 1, "assistant", good),
            # conv 3: malformed call (truncated JSON) + result
            (3, 0, "user", "x"),
            (3, 1, "assistant", good[:-1]),
            (3, 2, "tool", "result: y"),
            # conv 4: orphan result (no call before it)
            (4, 0, "user", "x"),
            (4, 1, "tool", "stray"),
            (4, 2, "assistant", "z"),
            # conv 5: no tool turns at all
            (5, 0, "user", "hi"),
            (5, 1, "assistant", "hello"),
        ],
        "conv_id long, turn_idx long, role string, turn_text string",
    )
    calls = {
        (r.conv_id, r.turn_idx): r
        for r in tool_call_extract(turns).collect()
    }
    assert set(calls) == {(1, 1), (2, 1), (3, 1)}
    c1 = calls[(1, 1)]
    assert (c1.tool_name, c1.arg_q) == ("search", "spark join")
    assert c1.is_wellformed and c1.has_result
    assert calls[(2, 1)].is_wellformed and not calls[(2, 1)].has_result
    c3 = calls[(3, 1)]
    assert not c3.is_wellformed and c3.has_result
    assert c3.tool_name is None

    stats = {r.conv_id: r for r in tool_call_stats(turns).collect()}
    assert stats[1].is_valid
    assert stats[1].n_tool_calls == 1 and stats[1].n_paired_calls == 1
    assert not stats[2].is_valid  # unpaired
    assert not stats[3].is_valid  # malformed
    assert stats[3].n_wellformed_calls == 0
    r4 = stats[4]
    assert r4.n_orphan_results == 1 and not r4.is_valid
    assert stats[5].is_valid  # no tool turns -> trivially valid
    assert stats[5].n_tool_calls == 0


def test_tool_loss_mask_covers_calls_not_results(spark):
    """In tool conversations the trainable spans include the call
    JSON (assistant emits calls) and never a tool result."""
    from data_engineering_spark.operators.sft import (
        chat_template_flatten,
        loss_mask_spans,
    )

    good = '{"name":"search","arguments":{"q":"a b"}}'
    turns = spark.createDataFrame(
        [
            (1, 0, "user", "find"),
            (1, 1, "assistant", good),
            (1, 2, "tool", "result: a"),
            (1, 3, "assistant", "answer"),
        ],
        "conv_id long, turn_idx long, role string, turn_text string",
    )
    chat = chat_template_flatten(turns).collect()[0].chat_text
    spans = loss_mask_spans(turns).collect()
    texts = {r.turn_idx: chat[r.span_start : r.span_end] for r in spans}
    assert texts == {1: good, 3: "answer"}  # call JSON in, result out


def test_tool_stats_stream_equals_batch(spark, tmp_path):
    """Tool-call pairing is intra-conversation (neighbor joins on
    (conv, idx)), and a conversation derives from one document row —
    so the streaming wiring must reproduce the batch tool-stats
    report exactly across any micro-batch slicing (the chat-flatten
    parity argument extended to the tool family)."""
    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.sft import tool_call_stats
    from data_engineering_spark.queries.sft import (
        _tool_perturb,
        _tool_turns,
    )

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "src")
    d.filter(F.col("doc_id") % 2 == 0).write.parquet(
        src, mode="overwrite"
    )
    d.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
    got: list = []

    def sink(batch_df, _bid):
        got.extend(
            tool_call_stats(
                _tool_perturb(synthesize_turns(batch_df))
            ).collect()
        )

    q = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = {
        r["conv_id"]: tuple(r)[1:]
        for r in tool_call_stats(
            _tool_turns(spark, "/root/testdata/sf0.001")
        ).collect()
    }
    assert {r["conv_id"]: tuple(r)[1:] for r in got} == batch
