"""Symmetric-delete similarity join: completeness vs brute force on
crafted strings (substitution / insertion / deletion / transposition),
k=2 neighborhoods, and template-prefix robustness."""

from __future__ import annotations

import itertools

import pytest

from leader_graph_spark.operators.stringsim import similar_string_pairs


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(names: list[str], k: int) -> set[tuple[str, str, int]]:
    out = set()
    for a, b in itertools.combinations(sorted(names), 2):
        d = _levenshtein(a, b)
        if d <= k:
            out.add((a, b, d))
    return out


NAMES = [
    "Customer#000000001",
    "Customer#000000002",  # substitution of 1
    "Customer#00000001",   # deletion from 1
    "Customer#0000000012", # insertion into 1
    "Customer#000000100",  # substitution distance 2 from 1
    "Xustomer#000000001",  # substitution in the shared template prefix
    "Supplier#000000001",  # far from all Customer#…
    "ab",
    "ba",                  # transposition: levenshtein 2, not 1
    "a",
    "",
]


@pytest.mark.parametrize("k", [1, 2])
def test_matches_brute_force(spark, k):
    df = spark.createDataFrame([(n,) for n in NAMES], ["name"])
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in similar_string_pairs(df, "name", k=k).collect()
    }
    assert got == _brute(NAMES, k)


def test_duplicate_rows_collapse(spark):
    df = spark.createDataFrame([("aaa",), ("aaa",), ("aab",)], ["name"])
    rows = similar_string_pairs(df, "name", k=1).collect()
    assert [(r.name_a, r.name_b, r.dist) for r in rows] == [("aaa", "aab", 1)]


def test_nulls_ignored(spark):
    df = spark.createDataFrame([("abc",), (None,), ("abd",)], ["name"])
    rows = similar_string_pairs(df, "name", k=1).collect()
    assert [(r.name_a, r.name_b) for r in rows] == [("abc", "abd")]


def test_long_values_excluded(spark):
    """Document-sized strings are excluded by max_len — the deletion
    neighborhood is for keys; a 5000-char string at k=2 would fan out
    ~25M variants. Long-text similarity is the MinHash family's job."""
    df = spark.createDataFrame(
        [("short",), ("shore",), ("x" * 500,), ("x" * 500 + "y",)], ["name"]
    )
    rows = similar_string_pairs(df, "name", k=1).collect()
    assert [(r.name_a, r.name_b) for r in rows] == [("shore", "short")]
    # raising the cap brings the long pair back
    rows2 = similar_string_pairs(df, "name", k=1, max_len=1000).collect()
    assert len(rows2) == 2
