"""Property-based tests for the round-4 exact-join operators: the
symmetric-delete fuzzy join and the bucketized range join must equal
their brute-force models on ARBITRARY generated inputs, not just the
crafted fixtures. Few examples, each a whole batch through one job."""

from __future__ import annotations

import itertools

import pytest
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from leader_graph_spark.operators.intervals import point_in_interval_join
from leader_graph_spark.operators.stringsim import similar_string_pairs

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# small alphabet → collisions and near-misses are common
words = st.lists(st.text(alphabet="abX#", min_size=0, max_size=6), min_size=1, max_size=18)


@settings(**_SETTINGS)
@given(words, st.sampled_from([1, 2]))
def test_similar_pairs_match_brute(spark, vals, k):
    df = spark.createDataFrame([(v,) for v in vals], "name string")
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in similar_string_pairs(df, "name", k=k).collect()
    }
    uniq = sorted(set(vals))
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(uniq, 2)
        if _lev(a, b) <= k
    }
    assert got == want


base = datetime(1995, 1, 1)
pts_st = st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=40)
ivs_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=400), st.integers(min_value=0, max_value=90)
    ),
    min_size=1,
    max_size=12,
)


@pytest.mark.slow  # 8 examples × ~14 s; test_point_in_interval_join_exact_and_no_bnlj anchors the operator by default
@settings(**_SETTINGS)
@given(pts_st, ivs_st)
def test_range_join_matches_brute(spark, day_offsets, iv_specs):
    pts = spark.createDataFrame(
        [(i, base + timedelta(days=d)) for i, d in enumerate(day_offsets)],
        "pid long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (f"w{i}", base + timedelta(days=s), base + timedelta(days=s + ln))
            for i, (s, ln) in enumerate(iv_specs)
        ],
        "w string, s timestamp, e timestamp",
    )
    got = sorted(
        (r.pid, r.w)
        for r in point_in_interval_join(
            pts, ivs, point_col="ts", start_col="s", end_col="e"
        ).collect()
    )
    want = sorted(
        (r.pid, r.w)
        for r in pts.join(
            ivs, (F.col("s") <= F.col("ts")) & (F.col("ts") < F.col("e"))
        ).collect()
    )
    assert got == want


changes_st = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),       # key
        st.integers(min_value=0, max_value=50),      # value
        st.sampled_from([1, -1]),                    # insert / delete
    ),
    min_size=0,
    max_size=25,
)
base_st = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(min_value=0, max_value=50)),
    min_size=1,
    max_size=25,
)


@settings(**_SETTINGS)
@given(base_st, changes_st)
def test_retractable_delta_matches_recompute(spark, base_rows, raw_changes):
    """Random insert/delete streams: the maintained state must equal a
    full recompute of the final relation. Deletes are constrained to
    rows actually present (the operator's caller contract)."""
    from collections import Counter

    from leader_graph_spark.operators.skew import apply_retractable_delta

    present = Counter(base_rows)
    changes = []
    for k, v, w in raw_changes:
        if w < 0:
            if present[(k, v)] <= 0:
                continue  # cannot delete a missing row
            present[(k, v)] -= 1
        else:
            present[(k, v)] += 1
        changes.append((k, v, w))
    final_rows = [kv for kv, n in present.items() for _ in range(n)]

    base = spark.createDataFrame(base_rows, "k string, v long")
    state0 = base.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("total"),
        F.min("v").alias("min_v"), F.max("v").alias("max_v"),
    )
    if not changes:
        return
    chg = spark.createDataFrame(changes, "k string, v long, w int")
    current = (
        spark.createDataFrame(final_rows, "k string, v long")
        if final_rows
        else spark.createDataFrame([], "k string, v long")
    )
    got = {
        r.k: (r.n, r.total, r.min_v, r.max_v)
        for r in apply_retractable_delta(state0, chg, current, keys=["k"], value_col="v").collect()
    }
    want = {}
    for (k, v), n in present.items():
        if n <= 0:
            continue
        cnt, tot, mn, mx = want.get(k, (0, 0, None, None))
        cnt += n
        tot += v * n
        mn = v if mn is None else min(mn, v)
        mx = v if mx is None else max(mx, v)
        want[k] = (cnt, tot, mn, mx)
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 2000)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from([32, 100]),
    st.sampled_from([2, 8]),
)
def test_length_bucketed_batches_match_model(spark, rows, width, bsize):
    """Assignment equals the obvious single-threaded model for any
    corpus, bucket width, and batch size."""
    from leader_graph_spark.operators.packing import length_bucketed_batches

    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    got = {
        r.doc_id: (r.length_bucket, r.batch_idx, r.batch_pos)
        for r in length_bucketed_batches(
            df, id_col="doc_id", token_col="n_tok",
            bucket_width=width, batch_size=bsize,
        ).collect()
    }
    from collections import defaultdict

    buckets = defaultdict(list)
    for doc_id, tok in rows:
        buckets[tok // width].append((tok, doc_id))
    want = {}
    for b, docs in buckets.items():
        for i, (tok, doc_id) in enumerate(sorted(docs)):
            want[doc_id] = (b, i // bsize, i % bsize)
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 2000)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from([1, 3, 8]),
)
def test_striped_shards_match_model(spark, rows, n_shards):
    """Serpentine deal equals the single-threaded model regardless of
    how Spark partitions the input."""
    from leader_graph_spark.operators.packing import striped_shard_assignment

    df = spark.createDataFrame(rows, ["doc_id", "n_tok"]).repartition(7)
    got = {
        r.doc_id: r.shard
        for r in striped_shard_assignment(
            df, id_col="doc_id", token_col="n_tok", n_shards=n_shards
        ).collect()
    }
    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    want = {}
    for r0, (doc_id, _) in enumerate(order):
        rnd, pos = divmod(r0, n_shards)
        want[doc_id] = pos if rnd % 2 == 0 else n_shards - 1 - pos
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.integers(0, 25), min_size=3, max_size=30),
        min_size=2,
        max_size=10,
    ),
    st.sampled_from([(7, 10), (9, 10), (1, 2)]),
)
def test_containment_prefix_matches_bruteforce_random(spark, token_lists, t):
    """Prefix-filtered containment equals all-pairs brute force on
    random small-vocabulary corpora (heavy shingle sharing — the case
    where an unsound prefix bound would actually drop pairs)."""
    from leader_graph_spark.operators.dedup import containment_pairs_prefix

    t_num, t_den = t
    docs = [(i, " ".join(f"w{x}" for x in toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.id_1, r.id_2): (r.contained_id, r.containment)
        for r in containment_pairs_prefix(
            df, id_col="doc_id", text_col="text", t_num=t_num, t_den=t_den
        ).collect()
    }

    def shingles(text):
        toks = text.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: shingles(txt) for i, txt in docs}
    want = {}
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            small = min(len(sets[a]), len(sets[b]))
            if t_den * inter >= t_num * small:
                contained = a if len(sets[a]) <= len(sets[b]) else b
                want[(a, b)] = (contained, round(inter / small, 6))
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 10**6), min_size=5, max_size=80),
    st.integers(0, 10**6),
)
def test_equidepth_estimate_bound_random(values, threshold):
    """The estimation RULE range_selectivity_estimate implements —
    bucket by (rank·B) div N, estimate count(x > T) from buckets whose
    upper bound exceeds T — over-approximates and is off by at most one
    bucket for ANY data and threshold. (Pure model check: the Spark
    implementation of the same rule is pinned value-exactly by the
    query's oracle; this pins the rule's claimed bound itself.)"""
    B = 4
    n = len(values)
    ranked = sorted((v, i) for i, v in enumerate(values))
    buckets = {}
    for r, (v, _) in enumerate(ranked):
        b = (r * B) // n
        cnt, ub = buckets.get(b, (0, None))
        buckets[b] = (cnt + 1, v if ub is None else max(ub, v))
    est = sum(cnt for cnt, ub in buckets.values() if ub > threshold)
    exact = sum(1 for v in values if v > threshold)
    max_bucket = max(cnt for cnt, _ in buckets.values())
    assert est >= exact
    assert est - exact <= max_bucket
