"""Prefix-filtered exact Jaccard must equal the quadratic form on
crafted corpora that stress the filter's edges: exact duplicates,
pairs straddling the 0.8 threshold, size-ratio rejects, and hot
(stopword-like) shingles that only appear in suffixes."""

from __future__ import annotations

import random

import pytest

from leader_graph_spark.operators.dedup import (
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
)


def _pairs(df_fn, docs, spark, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        (r.id_1, r.id_2, r.jaccard) for r in df_fn(df, id_col="doc_id", text_col="text", **kw).collect()
    }


def test_crafted_threshold_edges(spark):
    words = " ".join(f"w{i}" for i in range(30))
    docs = [
        (1, words),                                              # 28 shingles
        (2, words),                                              # exact dup of 1 (J=1)
        (3, " ".join(f"w{i}" for i in range(29))),               # prefix-of: high J
        (4, " ".join(f"w{i}" for i in range(15))),               # size-ratio reject vs 1
        (5, " ".join(f"x{i}" for i in range(30))),               # disjoint
        (6, " ".join(f"w{i}" for i in list(range(28)) + [99, 98])),  # near 0.8
    ]
    got = _pairs(ngram_jaccard_pairs_prefix, docs, spark, shingle_n=3, t_num=4, t_den=5)
    want = _pairs(ngram_jaccard_pairs, docs, spark, shingle_n=3, threshold=0.8)
    assert got == want
    assert (1, 2, 1.0) in got


@pytest.mark.parametrize("seed", [7, 23])
def test_random_corpus_matches_quadratic(spark, seed):
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(40)]  # small vocab → hot shingles
    docs = []
    for i in range(30):
        n = rng.randint(6, 25)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant a few mutated near-dups of earlier docs
    for j in range(5):
        src = docs[j][1].split()
        k = rng.randrange(len(src))
        src[k] = rng.choice(vocab)
        docs.append((100 + j, " ".join(src)))
    got = _pairs(ngram_jaccard_pairs_prefix, docs, spark, shingle_n=3, t_num=4, t_den=5)
    want = _pairs(ngram_jaccard_pairs, docs, spark, shingle_n=3, threshold=0.8)
    assert got == want


def test_prefix_lanes_release_shingle_stream(spark):
    """The round-8 one-shot-leak fix, pinned BY SIZE: after the
    prefix-filtered Jaccard/containment result materializes, the
    corpus-sized shingle checkpoint must be GONE — only the small
    candidate checkpoint may remain. A block COUNT cannot distinguish
    the two one-block end states, so the assertion bounds the BYTES the
    call leaves persisted: the retained candidate checkpoint is a few
    KB of id pairs, while the shingle stream (~350 distinct corpora
    rows per doc here) measures well past the bound. Before the fix
    the pinned stream compounded across runs until the periodic-GC
    backstop (x30 back-to-back runs degraded 3x; SCALE.md round-8)."""
    from leader_graph_spark.operators.dedup import containment_pairs_prefix

    def persisted_bytes():
        return sum(
            info.memSize() + info.diskSize()
            for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        )

    # 400 docs x ~30 distinct word-shingles: the shingle stream is
    # ~12k fat deserialized rows (>= 1 MB on heap); candidates a few KB
    docs = [
        (
            i,
            " ".join(f"w{i}x{j}" for j in range(30)) + " shared tail tokens",
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bound = 512 * 1024

    base = persisted_bytes()
    ngram_jaccard_pairs_prefix(df, id_col="doc_id", text_col="text").count()
    leaked = persisted_bytes() - base
    assert leaked <= bound, f"ngram prefix left {leaked} bytes persisted"

    base = persisted_bytes()
    containment_pairs_prefix(df, id_col="doc_id", text_col="text").count()
    leaked = persisted_bytes() - base
    assert leaked <= bound, f"containment left {leaked} bytes persisted"

    # max_df branch (round-9 fix): the hot-shingle cut must retain only
    # the tiny hot checkpoint + candidates, never the filtered stream
    base = persisted_bytes()
    ngram_jaccard_pairs_prefix(
        df, id_col="doc_id", text_col="text", max_df=100
    ).count()
    leaked = persisted_bytes() - base
    assert leaked <= bound, f"ngram prefix(max_df) left {leaked} bytes persisted"


def test_max_df_branch_matches_filtered_quadratic(spark):
    """max_df semantics survive the round-9 lazy-verify rewrite: the
    prefix result with a hot cut equals the quadratic form run on the
    pre-filtered corpus (hot shingles stripped from every doc)."""
    rng = random.Random(5)
    vocab = [f"t{i}" for i in range(25)]
    docs = []
    for i in range(25):
        n = rng.randint(8, 20)
        # every doc shares a boilerplate tail -> hot shingles
        body = " ".join(rng.choice(vocab) for _ in range(n))
        docs.append((i, body + " common boiler plate tail"))
    for j in range(4):
        src = docs[j][1].split()
        src[rng.randrange(len(src) - 4)] = rng.choice(vocab)
        docs.append((200 + j, " ".join(src)))
    got = _pairs(
        ngram_jaccard_pairs_prefix, docs, spark, shingle_n=3, t_num=4, t_den=5, max_df=6
    )
    # oracle: strip shingles with df > 6 by hand, then quadratic Jaccard
    from collections import Counter

    def shingles(text):
        toks = text.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    df_count = Counter(s for _, t in docs for s in shingles(t))
    want = set()
    sets = {i: {s for s in shingles(t) if df_count[s] <= 6} for i, t in docs}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            if not a or not b:
                continue
            j = len(a & b) / len(a | b)
            if j >= 0.8:
                want.add((ids[x], ids[y], round(j, 6)))
    assert got == want
