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
