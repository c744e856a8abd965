"""Fellegi-Sunter record linkage (operators/linkage.py)."""

from __future__ import annotations

import pytest

from leader_graph_spark.operators.linkage import fellegi_sunter_link


def _sides(spark):
    a = spark.createDataFrame(
        [
            (1, "ann", "A", "b1"),
            (2, "bob", "B", "b2"),
            (3, "cat", "C", "b3"),
            (4, "dan", "D", "b9"),  # no blocking partner -> dropped
            (5, None, "E", "b5"),  # null field vs null field
        ],
        "id int, name string, seg string, phone string",
    )
    b = spark.createDataFrame(
        [
            (11, "ann", "A", "b1"),  # full agreement
            (12, "rob", "B", "b2"),  # name disagrees
            (13, "kat", "X", "b3"),  # both disagree
            (15, None, "E", "b5"),  # null == null agrees (eqNullSafe)
        ],
        "id int, name string, seg string, phone string",
    )
    return a, b


WEIGHTS = {"name": (2000, -1000), "seg": (500, -700)}


def test_fellegi_sunter_scores_and_verdicts(spark):
    a, b = _sides(spark)
    out = {
        r.id_l: (r.agree_name, r.agree_seg, r.score_milli, r.verdict)
        for r in fellegi_sunter_link(
            a,
            b,
            block_on="phone",
            compare={"name": ("name", "name"), "seg": ("seg", "seg")},
            weights=WEIGHTS,
            match_threshold=2000,
            possible_threshold=0,
        ).collect()
    }
    assert set(out) == {1, 2, 3, 5}  # id 4's block has no partner
    assert out[1] == (True, True, 2500, "match")
    assert out[2] == (False, True, -500, "non_match")
    assert out[3] == (False, False, -1700, "non_match")
    # null-safe agreement: NULL name on both sides agrees
    assert out[5] == (True, True, 2500, "match")


def test_fellegi_sunter_possible_band_and_multi_key_blocking(spark):
    a, b = _sides(spark)
    out = {
        r.id_l: r.verdict
        for r in fellegi_sunter_link(
            a,
            b,
            block_on=["phone", "seg"],  # seg mismatch now blocks id 3's pair
            compare={"name": ("name", "name")},
            weights={"name": (2000, -1000)},
            match_threshold=3000,  # nothing reaches match
            possible_threshold=0,
        ).collect()
    }
    assert out == {1: "possible", 2: "non_match", 5: "possible"}


def test_fellegi_sunter_validates_inputs(spark):
    a, b = _sides(spark)
    with pytest.raises(ValueError, match="field mismatch"):
        fellegi_sunter_link(
            a, b, block_on="phone",
            compare={"name": ("name", "name")},
            weights={"seg": (1, -1)},
            match_threshold=1, possible_threshold=0,
        )
    with pytest.raises(ValueError, match="match_threshold"):
        fellegi_sunter_link(
            a, b, block_on="phone",
            compare={"name": ("name", "name")},
            weights={"name": (1, -1)},
            match_threshold=0, possible_threshold=5,
        )


def test_levenshtein_within_band_and_nulls(spark):
    from leader_graph_spark.operators.linkage import levenshtein_within

    a = spark.createDataFrame(
        [(1, "alpha", "b1"), (2, "alpha", "b2"), (3, None, "b3"), (4, "alpha", "b4")],
        "id int, name string, phone string",
    )
    b = spark.createDataFrame(
        [(1, "alphb", "b1"),   # distance 1: inside the band
         (2, "alpbx", "b2"),   # distance 2: outside
         (3, None, "b3"),      # NULL vs NULL agrees
         (4, None, "b4")],     # NULL vs value disagrees
        "id int, name string, phone string",
    )
    out = {
        r.id_l: r.agree_name
        for r in fellegi_sunter_link(
            a, b, block_on="phone",
            compare={"name": ("name", "name", levenshtein_within(1))},
            weights={"name": (1000, -1000)},
            match_threshold=1000, possible_threshold=0,
        ).collect()
    }
    assert out == {1: True, 2: False, 3: True, 4: False}

    with pytest.raises(ValueError, match="max_edits"):
        levenshtein_within(-1)
