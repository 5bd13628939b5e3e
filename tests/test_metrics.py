"""Distributed exact AUC: midrank Mann-Whitney algebra vs brute force."""

from __future__ import annotations

import pytest

from retailfeaturestore_spark.ml.metrics import exact_auc


def brute_auc(pairs):
    """Pairwise definition: P(score_pos > score_neg) + 0.5 P(equal)."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    wins = ties = 0
    for p in pos:
        for q in neg:
            if p > q:
                wins += 1
            elif p == q:
                ties += 1
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


@pytest.mark.parametrize(
    "pairs",
    [
        # perfect separation
        [(1, 0), (2, 0), (3, 1), (4, 1)],
        # perfect inversion
        [(5, 1), (6, 1), (7, 0), (8, 0)],
        # heavy ties across classes
        [(1, 0), (1, 1), (1, 0), (1, 1), (2, 1), (0, 0)],
        # all scores identical -> AUC exactly 0.5
        [(7, 0), (7, 1), (7, 0), (7, 1)],
    ],
)
def test_exact_auc_matches_bruteforce_fixtures(spark, pairs):
    df = spark.createDataFrame(pairs, "s long, y long")
    row = exact_auc(df, "s", "y").collect()[0]
    assert row.auc == brute_auc(pairs)


def test_exact_auc_randomized_with_ties(spark):
    import random

    rng = random.Random(20260814)
    pairs = [
        (rng.randrange(0, 25), rng.randrange(0, 2)) for _ in range(400)
    ]
    df = spark.createDataFrame(pairs, "s long, y long").repartition(8)
    row = exact_auc(df, "s", "y").collect()[0]
    want = brute_auc(pairs)
    assert row.auc == want  # exact integer algebra -> equality, not approx
    assert row.n_pos == sum(y for _, y in pairs)
    assert row.u2 % 1 == 0


def test_exact_auc_single_class_is_null_not_crash(spark):
    df = spark.createDataFrame([(3, 1), (5, 1)], "s long, y long")
    row = exact_auc(df, "s", "y").collect()[0]
    assert row.auc is None and row.n_neg == 0
