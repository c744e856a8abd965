"""Bloom-filter join pre-filter (operators/bloom.py).

The contract under test: the pre-filter passes a SUPERSET of the
joinable big-side rows (never drops a match — false negatives are
impossible by construction) while pruning most non-matching rows, and
the prefiltered join's result is exactly the plain join's.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from leader_graph_spark.operators.bloom import (
    bloom_build,
    bloom_prefilter,
    bloom_prefiltered_join,
)


def _tables(spark):
    big = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("payload")
    )
    small = spark.range(0, 50).select((F.col("id") * 7).alias("sk"))
    return big, small


def test_no_false_negatives_and_prunes(spark):
    big, small = _tables(spark)
    pre = bloom_prefilter(
        big, small, big_key="k", small_key="sk", m_bits=1 << 12, k_hashes=3
    )
    matched = big.join(small, F.col("k") == F.col("sk")).select("k", "payload")
    pre_keys = {(r.k, r.payload) for r in pre.collect()}
    # superset of every true match
    assert {(r.k, r.payload) for r in matched.collect()} <= pre_keys
    # and actually prunes: 50 of 1000 key values match; with a 4096-bit
    # filter over 150 positions the false-positive rate is well under
    # 20%, so far fewer than half the 5000 rows survive
    assert len(pre_keys) < 2500


def test_join_equals_plain_join(spark):
    big, small = _tables(spark)
    got = bloom_prefiltered_join(
        big, small, big_key="k", small_key="sk", m_bits=1 << 12, k_hashes=3
    )
    want = big.join(small, F.col("k") == F.col("sk"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_empty_small_side_filters_everything(spark):
    big, small = _tables(spark)
    pre = bloom_prefilter(
        big,
        small.where(F.lit(False)),
        big_key="k",
        small_key="sk",
        m_bits=1 << 12,
        k_hashes=3,
    )
    assert pre.count() == 0


def test_null_keys_dropped(spark):
    big = spark.createDataFrame([(1,), (None,), (2,)], ["k"])
    small = spark.createDataFrame([(1,), (2,)], ["sk"])
    pre = bloom_prefilter(
        big, small, big_key="k", small_key="sk", m_bits=1 << 12, k_hashes=3
    )
    assert sorted(r.k for r in pre.collect()) == [1, 2]


def test_bitmap_shape(spark):
    _, small = _tables(spark)
    row = bloom_build(small, "sk", m_bits=1 << 12, k_hashes=3).collect()[0]
    assert len(row.bitmap) == (1 << 12) // 64
    set_bits = sum(bin(w & ((1 << 64) - 1)).count("1") for w in row.bitmap)
    # ≤ k·n distinct positions, and at least one bit per distinct key
    assert 50 <= set_bits <= 150


# --- property tests -------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_key_sets = st.tuples(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=60),
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=60),
    st.sampled_from([256, 1024, 4096]),
    st.integers(min_value=1, max_value=4),
)


@settings(**_SETTINGS)
@given(_key_sets)
def test_property_no_false_negatives(spark, case):
    """For ANY key sets, m, and k: every big-side row whose key is in
    the small set survives the pre-filter (bloom can over-approximate,
    never under-approximate)."""
    small_keys, big_keys, m_bits, k_hashes = case
    big = spark.createDataFrame([(k,) for k in big_keys], "k long")
    small = spark.createDataFrame(
        [(k,) for k in small_keys] or [(None,)], "sk long"
    )
    pre = {
        r.k
        for r in bloom_prefilter(
            big, small, big_key="k", small_key="sk",
            m_bits=m_bits, k_hashes=k_hashes,
        ).collect()
    }
    must_pass = set(big_keys) & set(small_keys)
    assert must_pass <= pre


def test_bloom_bitmap_persists_as_lake_artifact(spark, tmp_path):
    """The bitmap row is an ordinary DataFrame: write it once when the
    dimension updates, broadcast-probe it from any later job — the
    persisted-index pattern (same seam as the IVF index)."""
    big, small = _tables(spark)
    path = str(tmp_path / "bloom_idx")
    bloom_build(small, "sk", m_bits=1 << 12, k_hashes=3).write.parquet(path)
    from leader_graph_spark.operators.bloom import bloom_probe_sql

    reloaded = spark.read.parquet(path)
    pre = (
        big.join(F.broadcast(reloaded))
        .where(F.expr(bloom_probe_sql("k", m_bits=1 << 12, k_hashes=3)))
        .drop("bitmap")
    )
    live = bloom_prefilter(
        big, small, big_key="k", small_key="sk", m_bits=1 << 12, k_hashes=3
    )
    assert sorted(map(tuple, pre.collect())) == sorted(map(tuple, live.collect()))


def test_kmv_estimates_within_error_bounds(spark):
    """KMV with k=64 carries ~1/sqrt(k-2) ≈ 13% standard error; assert
    the union/intersection estimates land within 3σ of truth on
    overlapping synthetic sets, and that sub-k sets are EXACT."""
    from pyspark.sql import functions as F

    from leader_graph_spark.operators.kmv import kmv_overlap_estimates, kmv_sketch

    a = spark.range(0, 3000).select(F.col("id").alias("k"))
    b = spark.range(1500, 4500).select(F.col("id").alias("k"))
    sa = kmv_sketch(a, key_col="k", k=64)
    sb = kmv_sketch(b, key_col="k", k=64)
    row = kmv_overlap_estimates(sa, sb, k=64).first()
    assert abs(row.union_est - 4500) / 4500 < 0.4
    assert abs(row.intersection_est - 1500) / 1500 < 0.6
    # deterministic: same input, same estimate, bit for bit
    again = kmv_overlap_estimates(sa, sb, k=64).first()
    assert (row.union_est, row.jaccard_est, row.intersection_est) == (
        again.union_est,
        again.jaccard_est,
        again.intersection_est,
    )
    # sub-k sets are exact
    small_a = spark.range(0, 40).select(F.col("id").alias("k"))
    small_b = spark.range(20, 60).select(F.col("id").alias("k"))
    r2 = kmv_overlap_estimates(
        kmv_sketch(small_a, key_col="k", k=64),
        kmv_sketch(small_b, key_col="k", k=64),
        k=64,
    ).first()
    assert r2.union_est == 60.0
    # exact up to the documented round-6 on the jaccard ratio
    assert abs(r2.intersection_est - 20.0) < 1e-3
