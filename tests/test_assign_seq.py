"""assign_seq: the scalable global-rank kernel (SURVEY.md §4.3).

The rank must depend only on the total order — identical across the
single-sort, sampled-range, and computed-bucket (range_hint) plans, for
any bucket count, including skewed/clustered key distributions and hint
bounds that are loose or partially wrong (clamping keeps buckets
order-contiguous).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from abot_spark.plans.wave import assign_seq

ORD = ["parent_seq", "kind", "pos"]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "parent_seq long, kind int, pos int, url_hash long")


def _ranks(df):
    out = df.orderBy("seq").collect()
    return [(r["parent_seq"], r["kind"], r["pos"], r["seq"]) for r in out]


@pytest.fixture(scope="module")
def rows():
    # clustered parent_seq (each parent has many links) + a skewed head
    rows = []
    for p in range(40):
        fan = 50 if p < 3 else 5  # head parents dominate
        for i in range(fan):
            rows.append((p + 100, 1 if i % 7 else 0, i, hash((p, i)) % 10**9))
    return rows


def _expected(rows, start):
    srt = sorted(rows, key=lambda r: (r[0], r[1], r[2], r[3]))
    return [(r[0], r[1], r[2], start + i) for i, r in enumerate(srt)]


def test_hinted_matches_sampled(spark, rows):
    df = _mk(spark, rows)
    base = _ranks(assign_seq(df, ORD + ["url_hash"], 7, num_partitions=8))
    hinted = _ranks(assign_seq(df, ORD + ["url_hash"], 7, num_partitions=8,
                               range_hint=("parent_seq", 100, 140)))
    assert base == hinted
    assert [r[3] for r in base] == list(range(7, 7 + len(rows)))


def test_hinted_loose_bounds(spark, rows):
    """Bounds wider / narrower than the data only affect balance, not rank
    (out-of-range values clamp to the first/last bucket)."""
    df = _mk(spark, rows)
    want = [r[3] for r in _expected(rows, 0)]
    for lo, hi in [(0, 1000), (120, 125), (100, 101)]:
        got = assign_seq(df, ORD + ["url_hash"], 0, num_partitions=5,
                         range_hint=("parent_seq", lo, hi))
        assert [r[3] for r in _ranks(got)] == want, (lo, hi)


def test_hinted_single_bucket_and_many(spark, rows):
    df = _mk(spark, rows)
    want = _ranks(assign_seq(df, ORD + ["url_hash"], 0, num_partitions=8))
    for nparts in (1, 3, 64):
        got = _ranks(assign_seq(df, ORD + ["url_hash"], 0,
                                num_partitions=nparts,
                                range_hint=("parent_seq", 100, 140)))
        assert got == want, nparts


def test_hint_on_constant_prefix(spark):
    """Seed-pass shape: parent_seq/kind constant, order decided by pos —
    hinting on pos is valid because every column before it is constant."""
    rows = [(0, 1, i, i * 7 % 101) for i in range(500)]
    df = _mk(spark, rows)
    got = assign_seq(df, ORD + ["url_hash"], 0, num_partitions=6,
                     range_hint=("pos", 0, 500))
    assert [r[3] for r in _ranks(got)] == list(range(500))
