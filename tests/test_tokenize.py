"""BPE-apply semantics: rank precedence, left-most tie-breaking,
unknown-character passthrough, and the Spark operator vs the pure
model on the driver corpus."""

from __future__ import annotations

import hashlib

from leader_graph_spark.operators.tokenize import bpe_encode_stats, encode_word


def test_rank_precedence_over_position():
    # ('b','c') has lower rank than ('a','b'): it must merge FIRST even
    # though ('a','b') appears earlier in the word.
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert encode_word("abc", ranks) == ["a", "bc"]
    # reversed ranks → the other path, and a cascade becomes possible.
    ranks2 = {("a", "b"): 0, ("b", "c"): 1, ("ab", "c"): 2}
    assert encode_word("abc", ranks2) == ["abc"]


def test_leftmost_wins_equal_rank():
    ranks = {("a", "a"): 0}
    # aaa: left-most pair merges first → (aa, a); no further merge listed.
    assert encode_word("aaa", ranks) == ["aa", "a"]


def test_unknown_chars_pass_through():
    assert encode_word("xyz", {("a", "b"): 0}) == ["x", "y", "z"]
    assert encode_word("", {}) == []


def test_spark_operator_matches_model(spark, sf_smoke):
    from leader_graph_spark.plans import REGISTRY
    from leader_graph_spark.sources.tables import load_table

    merges = [("s", "p"), ("sp", "a"), ("spa", "r"), ("spar", "k"),
              ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
              ("e", "r"), ("o", "r")]
    ranks = {m: i for i, m in enumerate(merges)}
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.tokens_fp)
        for r in bpe_encode_stats(
            docs, id_col="doc_id", text_col="text", merges=merges
        ).collect()
    }
    for row in docs.collect():
        words = (row.text or "").strip().lower().split()
        toks = [t for w in words for t in encode_word(w, ranks)]
        fp = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert got[row.doc_id] == (len(words), len(toks), fp)
    # the merge table actually bites: "spark" must be a single token.
    assert encode_word("spark", ranks) == ["spark"]
    # and the registered query drives this operator, emitting the
    # cross-engine word count plus the sandwich assertion (round-6
    # bounded-oracle form; raw token counts/fp stay pinned above).
    q = REGISTRY["bpe_token_counts"].spark(spark, sf_smoke)
    assert set(q.columns) == {"doc_id", "n_words", "tokens_within_bounds"}
    assert q.filter("NOT tokens_within_bounds").count() == 0
