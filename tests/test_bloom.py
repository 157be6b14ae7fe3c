"""Bloom-filter incremental-dedup operator guarantees: no false
negatives (a shingle the prior corpus contains ALWAYS hits), and the
persisted artifact is the bit-set alone (bounded by m)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_flink_spark.operators.dedup import (
    bloom_shingle_hits,
    doc_shingles,
    shingle_bloom_bits,
)

M, K = 4096, 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_bloom_has_no_false_negatives(spark):
    """An incoming doc identical to a prior doc must have EVERY shingle
    hit — bloom membership can over-report but never miss."""
    prior = doc_shingles(
        _docs(spark, [(1, "the quick brown fox jumps over the lazy dog")])
    )
    bloom = shingle_bloom_bits(prior, m=M, k=K)
    inc = doc_shingles(
        _docs(spark, [(2, "the quick brown fox jumps over the lazy dog")])
    )
    row = bloom_shingle_hits(inc, bloom, m=M, k=K).collect()[0]
    assert row.n_hits == row.n_shingles


def test_bloom_bitset_bounded_and_integer(spark):
    prior = doc_shingles(
        _docs(spark, [(i, f"tok{i} tok{i + 1} tok{i + 2} tok{i + 3}") for i in range(20)])
    )
    bits = shingle_bloom_bits(prior, m=M, k=K)
    rows = bits.collect()
    assert len(rows) <= M
    assert all(0 <= r.bit_pos < M for r in rows)
    # distinct: the artifact is a set, not a multiset
    assert len({r.bit_pos for r in rows}) == len(rows)


def test_bloom_disjoint_shingles_mostly_miss(spark):
    """Shingles sharing nothing with the prior corpus should (almost)
    never fully hit at this fill ratio — the fp path, probabilistically
    tiny with m >> k*n."""
    prior = doc_shingles(
        _docs(spark, [(1, "alpha beta gamma delta epsilon zeta")])
    )
    bloom = shingle_bloom_bits(prior, m=M, k=K)
    inc = doc_shingles(
        _docs(spark, [(2, "one two three four five six seven eight")])
    )
    row = bloom_shingle_hits(inc, bloom, m=M, k=K).collect()[0]
    assert row.n_hits == 0


def test_bloom_prefilter_join_equals_plain_join(spark):
    """`bloom_prefilter_join` must be row-identical to the plain equi-join
    (no false negatives by construction; false positives eliminated by the
    exact join) — and the membership mask must pass EVERY dimension key
    while rejecting at least some non-joining fact keys."""
    from pyspark.sql import functions as F

    from twitter_flink_spark.operators.joins import (
        bloom_membership_mask,
        bloom_prefilter_join,
    )

    fact = spark.createDataFrame(
        [(i % 50, i) for i in range(400)], "fk long, payload long"
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 50, 7)], "dk long, name string"
    )
    got = sorted(
        tuple(r)
        for r in bloom_prefilter_join(fact, dim, "fk", "dk").collect()
    )
    want = sorted(
        tuple(r) for r in fact.join(dim, fact["fk"] == dim["dk"]).collect()
    )
    assert got == want and len(got) > 0

    mask = bloom_membership_mask(dim, "dk", "fk")
    n_pass = fact.where(mask).count()
    n_true = fact.join(
        F.broadcast(dim.select("dk")), fact["fk"] == F.col("dk"), "left_semi"
    ).count()
    assert n_true <= n_pass < fact.count()  # no FN; some rejection
