"""Incremental LSH index: probe+extend equivalence with a full rebuild,
update no-op coverage, and torn-append crash recovery."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from twitter_flink_spark.operators.dedup import (
    LSH_BANDS,
    doc_shingles,
    jaccard_verify,
    lsh_bands,
    lsh_candidate_pairs,
    lsh_index_build,
    lsh_index_candidates,
    lsh_index_update,
    minhash_signature,
)
from twitter_flink_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _split_docs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    b = docs.agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")).first()
    split = (int(b["mn"]) + int(b["mx"])) // 2
    return docs, split


def test_incremental_index_equals_full_rebuild(spark, tmp_path):
    """build(corpus) + update(new) must yield EXACTLY the candidate pairs
    of a batch banding over everything — the incremental-maintenance
    invariant — and a full-table re-update must be a pure no-op."""
    docs, split = _split_docs(spark)
    idx = str(tmp_path / "lshidx")
    n0 = lsh_index_build(spark, docs.where(F.col("doc_id") <= split), idx)
    n1 = lsh_index_update(spark, docs.where(F.col("doc_id") > split), idx)
    assert n0 > 0 and n1 > 0
    assert lsh_index_update(spark, docs, idx) == 0  # fully covered

    got = sorted(
        (r["doc_a"], r["doc_b"])
        for r in lsh_index_candidates(spark, idx).collect()
    )
    batch = lsh_candidate_pairs(
        lsh_bands(minhash_signature(doc_shingles(docs)))
    )
    exp = sorted((r["doc_a"], r["doc_b"]) for r in batch.collect())
    assert got == exp and len(got) > 0


def test_incremental_index_recovers_torn_append(spark, tmp_path):
    """A doc with only SOME of its bands present (a torn multi-file
    append) must be re-indexed by the next update — and the duplicate
    band rows a re-index creates must not change the candidate set."""
    docs, split = _split_docs(spark)
    idx = str(tmp_path / "lshidx")
    lsh_index_build(spark, docs.where(F.col("doc_id") <= split), idx)
    lsh_index_update(spark, docs.where(F.col("doc_id") > split), idx)
    clean = sorted(
        (r["doc_a"], r["doc_b"])
        for r in lsh_index_candidates(spark, idx).collect()
    )

    # tear one new-era doc: drop all but one of its band rows by
    # rewriting the index without them (simulates a crash mid-move)
    victim = int(
        spark.read.parquet(idx)
        .where(F.col("doc_id") > split)
        .agg(F.max("doc_id"))
        .first()[0]
    )
    kept = spark.read.parquet(idx).where(
        (F.col("doc_id") != victim) | (F.col("band") == 0)
    )
    tmp = idx + ".rewrite"
    # keep the segmented layout — this simulates a torn MOVE, not a
    # legacy index; seg rides along as the partition column
    kept.write.partitionBy("seg").mode("overwrite").parquet(tmp)
    from twitter_flink_spark.operators.skipping import _rm_committed

    _rm_committed(idx)  # the committed dest is a pointer symlink
    os.rename(tmp, idx)
    torn = spark.read.parquet(idx)
    assert torn.where(F.col("doc_id") == victim).count() == 1

    # recovery: the victim lost its coverage marker with the tear, so
    # the update re-indexes it (bands + a fresh marker)
    assert lsh_index_update(spark, docs, idx) == 1
    after = spark.read.parquet(idx)
    assert (
        after.where((F.col("doc_id") == victim) & (F.col("band") >= 0))
        .select("band")
        .distinct()
        .count()
        == LSH_BANDS
    )
    # duplicates (band 0 twice for the victim) do not change candidates
    got = sorted(
        (r["doc_a"], r["doc_b"])
        for r in lsh_index_candidates(spark, idx).collect()
    )
    assert got == clean


def test_incremental_index_verified_pairs_cross_era(spark, tmp_path):
    """End-to-end: index-served candidates restricted to new-side pairs,
    exact-Jaccard verified, equal the batch pipeline's pairs under the
    same restriction."""
    docs, split = _split_docs(spark)
    idx = str(tmp_path / "lshidx")
    lsh_index_build(spark, docs.where(F.col("doc_id") <= split), idx)
    lsh_index_update(spark, docs.where(F.col("doc_id") > split), idx)
    sh = doc_shingles(docs)
    got = sorted(
        tuple(r)
        for r in jaccard_verify(
            lsh_index_candidates(spark, idx).where(
                F.col("doc_b") > split
            ),
            sh,
        ).collect()
    )
    exp = sorted(
        tuple(r)
        for r in jaccard_verify(
            lsh_candidate_pairs(
                lsh_bands(minhash_signature(sh))
            ).where(F.col("doc_b") > split),
            sh,
        ).collect()
    )
    assert got == exp and len(got) > 0


def test_augmented_corpus_deterministic_prefixes(spark):
    """The recall curve's corpus augmentation: every 8th doc survives,
    each variant id is doc_id*10+level, and each variant text is the
    first ceil(frac*n) tokens (floored at 3) of the original."""
    import math

    from pyspark.sql import functions as F

    from twitter_flink_spark.queries.dedup import (
        AUG_FRACS,
        _augmented_corpus,
    )

    text = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(8, text), (5, "skipped doc")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r["text"] for r in _augmented_corpus(docs).collect()
    }
    # doc 5 is not a multiple of 8 -> dropped entirely
    assert set(rows) == {80, 81, 82, 83, 84, 85}
    assert rows[80] == text
    for lvl, frac in enumerate(AUG_FRACS, start=1):
        n = max(3, math.ceil(10 * frac))
        assert rows[80 + lvl] == " ".join(f"w{i}" for i in range(n))


def test_banding_recall_curve_bins_and_soundness(spark):
    """On a hand-built corpus the curve reports sound bins: n_caught <=
    n_true, recall = n_caught/n_true, and an exact-duplicate pair (the
    banded join cannot miss J=1) lands caught in the top bin."""
    from pyspark.sql import functions as F

    from twitter_flink_spark.operators.dedup import (
        doc_shingles,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signature,
        prefix_filter_jaccard_pairs,
    )

    words = [f"t{i}" for i in range(40)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(words)),
            (2, " ".join(words)),  # exact dup of 1 -> J = 1.0
            (3, " ".join(words[:20])),  # half prefix of 1 -> J ~ 0.47
        ],
        "doc_id long, text string",
    )
    truth = prefix_filter_jaccard_pairs(docs, threshold=0.35)
    sh = doc_shingles(docs)
    cand = lsh_candidate_pairs(lsh_bands(minhash_signature(sh)))
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for r in truth.collect()
    }
    assert got[(1, 2)] == 1.0
    assert 0.4 <= got[(1, 3)] <= 0.5
    caught = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    assert (1, 2) in caught  # identical signatures band together


def test_jaccard_verify_sets_equals_exploded_verify(spark):
    """`jaccard_verify_sets` (per-doc set table + array_intersect) must
    return row-identical verified pairs — jaccard values included — to
    `jaccard_verify` over the exploded shingle table, for the full LSH
    candidate set of the real corpus."""
    from twitter_flink_spark.operators.dedup import jaccard_verify_sets

    docs = load_table(spark, SF_DIR, "documents")
    sh = doc_shingles(docs)
    cands = lsh_candidate_pairs(lsh_bands(minhash_signature(sh)))
    sets = sh.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("sh")
    )
    for thr in (0.5, 0.0):  # 0.0 pins the zero-overlap guard: the
        # exploded verify drops no-intersection pairs structurally, so
        # the sets variant must too, even when the threshold keeps 0.0
        got = sorted(
            tuple(r)
            for r in jaccard_verify_sets(cands, sets, thr).collect()
        )
        exp = sorted(
            tuple(r) for r in jaccard_verify(cands, sh, thr).collect()
        )
        assert got == exp and len(got) > 0


def test_index_probe_finds_new_side_pairs_only(spark, tmp_path):
    """`lsh_index_probe` bands ONLY the probe docs and equi-joins the
    persisted index: probing the new era after extending must return
    exactly the batch pipeline's candidate pairs with at least one new
    side, and nothing old-old."""
    from twitter_flink_spark.operators.dedup import lsh_index_probe

    docs, split = _split_docs(spark)
    idx = str(tmp_path / "lshidx")
    lsh_index_build(spark, docs.where(F.col("doc_id") <= split), idx)
    new = docs.where(F.col("doc_id") > split)
    lsh_index_update(spark, new, idx)
    got = sorted(
        (r["doc_a"], r["doc_b"])
        for r in lsh_index_probe(spark, new, idx).collect()
    )
    batch = lsh_candidate_pairs(
        lsh_bands(minhash_signature(doc_shingles(docs)))
    )
    exp = sorted(
        (r["doc_a"], r["doc_b"])
        for r in batch.where(F.col("doc_b") > split).collect()
    )
    assert got == exp and len(got) > 0
    assert all(b > split for _, b in got)  # no old-old pair


def test_update_converges_with_subngram_docs(spark, tmp_path):
    """A doc with fewer than ``ngram`` tokens can never produce a band,
    so it must not count as "new" on every redelivery: the second
    update of the SAME batch (containing a 2-token doc) must return 0,
    or streaming redelivery-no-op flags would never converge."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa"),
            (3, "too short"),  # 2 tokens < ngram=3: band-ineligible
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "lshidx")
    lsh_index_build(spark, docs.where(F.col("doc_id") == 1), idx)
    n1 = lsh_index_update(spark, docs, idx)
    assert n1 == 1  # doc 2 only; doc 3 is ineligible, not "new"
    assert lsh_index_update(spark, docs, idx) == 0  # redelivery no-op
    # the ineligible doc never entered the index
    assert (
        spark.read.parquet(idx).where(F.col("doc_id") == 3).count() == 0
    )


def test_staged_pairs_equal_operator_recompute(spark):
    """The staged signature tables must be a pure cache: the verified
    pair set built from them is row-identical to the operator pipeline
    recomputing signatures from the documents table."""
    from twitter_flink_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    from twitter_flink_spark.queries.dedup import _near_dup_pairs_staged
    from twitter_flink_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    staged = {
        tuple(r)
        for r in _near_dup_pairs_staged(spark, sf).collect()
    }
    direct = {
        tuple(r)
        for r in minhash_near_dup_pairs(
            load_table(spark, sf, "documents"), threshold=0.5, ngram=3
        ).collect()
    }
    assert staged == direct and len(staged) > 0


def test_legacy_index_backfills_markers_once(spark, tmp_path):
    """A marker-less legacy index must fall back to the all-bands rule
    exactly ONCE: the first update backfills a coverage marker for
    every legacy-covered doc, so the next update's fast path sees the
    whole corpus — not just the batch — and never re-indexes the legacy
    corpus (the r12 ADVICE defect: batch-only markers made every legacy
    doc look new, an O(corpus) re-append that doubled the index)."""
    from twitter_flink_spark.operators.dedup import COVER_BAND

    docs, split = _split_docs(spark)
    old = docs.where(F.col("doc_id") <= split)
    new = docs.where(F.col("doc_id") > split)
    idx = str(tmp_path / "lshidx")
    n_old = lsh_index_build(spark, old, idx)

    # strip the markers: simulate an index written before COVER_BAND
    legacy = (
        spark.read.parquet(idx)
        .where(F.col("band") != COVER_BAND)
        .drop("seg", "nseg")  # pre-segmentation layouts had neither
    )
    tmp = idx + ".rewrite"
    legacy.write.mode("overwrite").parquet(tmp)
    from twitter_flink_spark.operators.skipping import _rm_committed

    _rm_committed(idx)
    os.rename(tmp, idx)
    band_rows_before = spark.read.parquet(idx).count()

    # update #1 on the legacy index: counts ONLY the new docs, appends
    # their bands, and backfills markers for the legacy corpus
    n1 = lsh_index_update(spark, docs, idx)
    n_new = new.where(F.size(F.split("text", " ")) >= 3).count()
    assert n1 == n_new
    after = spark.read.parquet(idx)
    assert (
        after.where(F.col("band") == COVER_BAND).count() == n_old + n_new
    )
    # legacy band rows were NOT duplicated: every legacy doc still has
    # exactly LSH_BANDS band rows
    legacy_per_doc = (
        after.where((F.col("doc_id") <= split) & (F.col("band") >= 0))
        .groupBy("doc_id")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert legacy_per_doc == LSH_BANDS

    # update #2: pure no-op on the fast (marker) path
    total_rows = after.count()
    assert total_rows == band_rows_before + n_new * (LSH_BANDS) + n_old + n_new
    assert lsh_index_update(spark, docs, idx) == 0
    assert spark.read.parquet(idx).count() == total_rows


def test_index_delete_tombstone_then_compact(spark, tmp_path):
    """Tombstoned docs must vanish from every serve path immediately
    (candidates AND probe, either side), survive redelivery (the
    coverage marker keeps the update from re-signing a deleted doc),
    and compaction must reclaim rows without changing the served set."""
    from twitter_flink_spark.operators.dedup import (
        TOMB_BAND,
        lsh_index_compact,
        lsh_index_delete,
        lsh_index_probe,
    )

    docs, split = _split_docs(spark)
    idx = str(tmp_path / "lshidx")
    lsh_index_build(spark, docs, idx)
    full = sorted(
        (r["doc_a"], r["doc_b"])
        for r in lsh_index_candidates(spark, idx).collect()
    )
    assert full, "fixture must have candidate pairs"
    # delete every doc appearing as doc_a in some pair: guarantees the
    # served set actually changes
    doomed_ids = sorted({a for a, _ in full})[:3]
    doomed = spark.createDataFrame(
        [(i,) for i in doomed_ids], "doc_id long"
    )
    assert lsh_index_delete(spark, doomed, idx) == len(doomed_ids)
    assert lsh_index_delete(spark, doomed, idx) == 0  # idempotent
    served = sorted(
        (r["doc_a"], r["doc_b"])
        for r in lsh_index_candidates(spark, idx).collect()
    )
    assert served == [
        p for p in full if p[0] not in doomed_ids and p[1] not in doomed_ids
    ]
    # probe with the whole corpus: deleted docs pair on neither side
    probed = lsh_index_probe(spark, docs, idx)
    bad = set(doomed_ids)
    assert not [
        r for r in probed.collect() if r["doc_a"] in bad or r["doc_b"] in bad
    ]
    # redelivery cannot resurrect: the update sees the marker, signs nothing
    assert lsh_index_update(spark, docs, idx) == 0
    # compact: rows shrink, tombstones gone, served set identical
    pre = spark.read.parquet(idx).count()
    assert lsh_index_compact(spark, idx) == len(doomed_ids)
    post = spark.read.parquet(idx)
    assert post.count() < pre
    assert post.where(F.col("band") == TOMB_BAND).count() == 0
    assert sorted(
        (r["doc_a"], r["doc_b"])
        for r in lsh_index_candidates(spark, idx).collect()
    ) == served
    assert lsh_index_compact(spark, idx) == 0  # no-op without tombstones


def test_legacy_index_delete_uses_fallback_coverage(spark, tmp_path):
    """Deleting from a marker-less legacy index must fall back to the
    all-bands coverage rule — not silently tombstone nothing."""
    from twitter_flink_spark.operators.dedup import (
        COVER_BAND,
        lsh_index_delete,
    )

    docs, split = _split_docs(spark)
    idx = str(tmp_path / "lshidx")
    lsh_index_build(spark, docs, idx)
    legacy = (
        spark.read.parquet(idx)
        .where(F.col("band") != COVER_BAND)
        .drop("seg", "nseg")  # pre-segmentation layouts had neither
    )
    tmp = idx + ".rewrite"
    legacy.write.mode("overwrite").parquet(tmp)
    from twitter_flink_spark.operators.skipping import _rm_committed

    _rm_committed(idx)
    os.rename(tmp, idx)

    victim = int(docs.agg(F.min("doc_id")).first()[0])
    doomed = spark.createDataFrame([(victim,)], "doc_id long")
    assert lsh_index_delete(spark, doomed, idx) == 1
    assert lsh_index_delete(spark, doomed, idx) == 0  # still idempotent
    got = lsh_index_candidates(spark, idx).where(
        (F.col("doc_a") == victim) | (F.col("doc_b") == victim)
    )
    assert got.count() == 0


def test_compact_rewrites_only_tombstone_bearing_segments(spark, tmp_path):
    """Segment-local compaction (the IVF cell-local precedent): every
    row of a doc — bands, marker, tombstone — shares one ``seg=N/``
    dir, so compacting a delete batch rewrites exactly the tombstones'
    segments. Untouched segments are pinned BY INODE: their files are
    not merely equal afterwards, they are the same files, never opened
    or rewritten. Served candidates match a full-rewrite oracle."""
    from twitter_flink_spark.operators.dedup import (
        TOMB_BAND,
        _seg_expr,
        lsh_index_compact,
        lsh_index_delete,
    )

    docs, split = _split_docs(spark)
    idx = str(tmp_path / "lshidx")
    lsh_index_build(spark, docs, idx)

    def seg_files():
        out = {}
        root = os.path.realpath(idx)
        for d in os.listdir(root):
            if d.startswith("seg="):
                seg_dir = os.path.realpath(os.path.join(root, d))
                out[d] = {
                    f: os.stat(os.path.join(seg_dir, f)).st_ino
                    for f in os.listdir(seg_dir)
                    if f.endswith(".parquet")
                }
        return out

    before = seg_files()
    assert len(before) >= 2, "fixture must span several segments"

    # doom every doc of ONE segment's hash class that has band rows
    seg_of = {
        int(r["doc_id"]): int(r["seg"])
        for r in spark.read.parquet(idx)
        .select("doc_id", "seg")
        .distinct()
        .collect()
    }
    target_seg = min(seg_of.values())
    doomed_ids = sorted(d for d, s in seg_of.items() if s == target_seg)[:2]
    doomed = spark.createDataFrame(
        [(i,) for i in doomed_ids], "doc_id long"
    )
    assert lsh_index_delete(spark, doomed, idx) == len(doomed_ids)
    # the tombstones landed in the same segment as their docs' rows
    tomb_segs = {
        int(r["seg"])
        for r in spark.read.parquet(idx)
        .where(F.col("band") == TOMB_BAND)
        .select("seg")
        .distinct()
        .collect()
    }
    assert tomb_segs == {target_seg}

    served_before = sorted(
        (r["doc_a"], r["doc_b"])
        for r in lsh_index_candidates(spark, idx).collect()
    )
    assert lsh_index_compact(spark, idx) == len(doomed_ids)
    after = seg_files()

    # untouched segments: identical file sets, identical INODES
    for d in before:
        if d == f"seg={target_seg}":
            continue
        assert after[d] == before[d], f"{d} was rewritten"
    # the touched segment was rewritten (no tombstones, no doomed rows)
    post = spark.read.parquet(idx)
    assert post.where(F.col("band") == TOMB_BAND).count() == 0
    assert (
        post.where(F.col("doc_id").isin([int(i) for i in doomed_ids])).count()
        == 0
    )
    # served set unchanged by the physical rewrite
    assert sorted(
        (r["doc_a"], r["doc_b"])
        for r in lsh_index_candidates(spark, idx).collect()
    ) == served_before
    # placement function sanity: the segment really is the doc hash
    seg_check = (
        spark.read.parquet(idx)
        .where(F.col("band") >= 0)
        .select("doc_id", "seg", _seg_expr(16).alias("want"))
        .where(F.col("seg") != F.col("want"))
        .count()
    )
    assert seg_check == 0


def test_band_parallel_spreads_single_partition_losslessly(spark):
    """`_band_parallel` must raise a one-partition doc batch to the
    session's parallelism (the micro-batch banding would otherwise run
    single-task — the shape `lsh_index_update` sees from foreachBatch)
    while leaving row CONTENT untouched, and must leave an
    already-parallel input's plan alone. Banding the spread batch must
    yield exactly the rows of banding the unspread one: the spread is
    physical only."""
    from twitter_flink_spark.operators.dedup import _band_parallel

    docs = load_table(spark, SF_DIR, "documents").coalesce(1)
    assert docs.rdd.getNumPartitions() == 1
    spreaded = _band_parallel(docs)
    n = spark.sparkContext.defaultParallelism
    assert spreaded.rdd.getNumPartitions() == n
    assert sorted(r["doc_id"] for r in spreaded.collect()) == sorted(
        r["doc_id"] for r in docs.collect()
    )
    # banding output identical (order-insensitive)
    def banded(d):
        rows = lsh_bands(minhash_signature(doc_shingles(d)))
        return sorted(
            (r["doc_id"], r["band"], r["band_hash"]) for r in rows.collect()
        )

    assert banded(spreaded) == banded(docs)
    # an input already at >= default parallelism passes through untouched
    wide = docs.repartition(n, F.col("doc_id"))
    assert _band_parallel(wide) is wide
