"""Similarity-operator guards: the brute-force path must refuse a
non-broadcast-sized query set instead of silently degrading to an
O(n*q) all-pairs pass (VERDICT r2 item 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitter_flink_spark.operators.similarity import topk_neighbors


def _vectors(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"), F.lit(1.0), F.lit(0.5)
        ).alias("embedding"),
    )


def test_bruteforce_refuses_oversized_query_set(spark):
    corpus = _vectors(spark, 50)
    queries = _vectors(spark, 20)
    with pytest.raises(ValueError, match="broadcasts the query side"):
        topk_neighbors(corpus, queries, k=2, max_broadcast_queries=10)


def test_bruteforce_runs_under_the_bound(spark):
    corpus = _vectors(spark, 50)
    queries = _vectors(spark, 5)
    out = topk_neighbors(corpus, queries, k=2, max_broadcast_queries=10)
    rows = out.collect()
    assert {r.query_id for r in rows} == set(range(5))
    assert all(1 <= r["rank"] <= 2 for r in rows)


def test_ivf_path_skips_the_guard(spark):
    """cell-restricted (IVF) scoring is the sanctioned large-query path —
    no broadcast bound applies."""
    corpus = _vectors(spark, 50).withColumn("cell", F.col("vec_id") % 3)
    queries = _vectors(spark, 30).withColumn("cell", F.col("vec_id") % 3)
    out = topk_neighbors(
        corpus, queries, k=1, cell_col="cell", max_broadcast_queries=10
    )
    assert out.count() > 0


def test_doc_lsh_finds_exact_duplicates(spark):
    """Two identical documents have identical tf-idf vectors, hence
    identical centered sign signatures — they MUST collide in every band
    and verify at cosine 1.0 (integer dot == both norms)."""
    from pyspark.sql import functions as F

    from twitter_flink_spark.operators.similarity import (
        doc_signature_profile,
        tfidf_fixed_point_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark window batch stream table"),
            (2, "spark window batch stream table"),
            (3, "row filter order vector data data"),
            (4, "completely different tokens here entirely"),
        ],
        "doc_id long, text string",
    )
    w = tfidf_fixed_point_weights(docs)
    prof = doc_signature_profile(w, 32, 4)
    banded = prof.select("doc_id", F.posexplode("sigs").alias("band", "band_sig"))
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "band_sig")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "band_sig")
    cands = (
        a.join(b, on=["band", "band_sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .collect()
    )
    hits = {(r.doc_a, r.doc_b): r.n_bands for r in cands}
    assert hits.get((1, 2)) == 4  # identical docs collide in all 4 bands
    prof12 = {
        r.doc_id: r
        for r in prof.where(F.col("doc_id").isin(1, 2)).collect()
    }
    assert prof12[1].sigs == prof12[2].sigs
    assert prof12[1].nn == prof12[2].nn


def test_doc_signature_profile_rejects_over_32_planes(spark):
    import pytest

    from twitter_flink_spark.operators.similarity import (
        doc_signature_profile,
        tfidf_fixed_point_weights,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="md5 digit budget"):
        doc_signature_profile(tfidf_fixed_point_weights(docs), 64, 4)


def test_kmeans_separates_obvious_clusters(spark):
    """Two well-separated groups: after 2 rounds, each surviving centroid
    sits at its group's mean and sizes are exact."""
    from twitter_flink_spark.operators.clustering import kmeans_fit

    rows = [
        (0, [0.0, 0.0]), (2, [1.0, 1.0]), (4, [0.5, 0.5]),   # group A
        (1, [10.0, 10.0]), (3, [11.0, 11.0]), (5, [10.5, 10.5]),  # group B
    ]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = {r.cid: (r.cent, r.n_vecs) for r in kmeans_fit(v, k=2, iters=2).collect()}
    assert set(cents) == {0, 1}
    a, an = cents[0]
    b, bn = cents[1]
    assert an == 3 and bn == 3
    assert all(abs(x - 0.5) < 1e-6 for x in a)
    assert all(abs(x - 10.5) < 1e-6 for x in b)


def test_kmeans_drops_emptied_cluster(spark):
    """A seed that captures no members after reassignment must vanish
    rather than divide by zero or linger as a stale centroid."""
    from twitter_flink_spark.operators.clustering import kmeans_fit

    # seeds are ids 0 and 1; every point is closest to the id-0 seed's
    # trajectory after round 1 (all points near origin, id 1 included)
    rows = [(0, [0.0, 0.0]), (1, [0.2, 0.2]), (2, [0.1, 0.1]), (3, [0.05, 0.0])]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.cid: r.n_vecs for r in kmeans_fit(v, k=2, iters=3).collect()}
    assert sum(out.values()) == 4  # every point assigned somewhere
    assert all(n > 0 for n in out.values())  # no empty clusters persist


def test_assign_clusters_matches_bruteforce_argmin(spark):
    """The map-side array-argmin assignment (array_min / array_sort over
    struct(dist, cid)) must reproduce the brute-force answer exactly:
    nearest centroid with ties to the LOWER cid, and top_n = the n
    nearest in (dist, cid) order — the contract the old window
    formulation implemented. Centroids chosen to force a genuine tie
    (two centroids equidistant from one point)."""
    from twitter_flink_spark.operators.clustering import assign_clusters

    vecs = [
        (10, [0.0, 0.0]),   # tie: equidistant to cids 1 and 2
        (11, [4.0, 0.0]),   # nearest cid 2
        (12, [-3.0, 1.0]),  # nearest cid 1
    ]
    cents = [(1, [-1.0, 0.0]), (2, [1.0, 0.0]), (3, [9.0, 9.0])]
    v = spark.createDataFrame(vecs, "vec_id long, e array<double>")
    c = spark.createDataFrame(cents, "cid long, cent array<double>")

    got = {r.vec_id: r.cid for r in assign_clusters(v, c).collect()}
    assert got == {10: 1, 11: 2, 12: 1}  # tie at vec 10 -> lower cid

    def brute(n):
        out = {}
        for vid, e in vecs:
            d = sorted(
                (
                    sum(x * x for x in e)
                    - 2 * sum(x * y for x, y in zip(e, cent))
                    + sum(y * y for y in cent),
                    cid,
                )
                for cid, cent in cents
            )
            out[vid] = [cid for _, cid in d[:n]]
        return out

    top2 = assign_clusters(v, c, top_n=2, keep_dist=True).collect()
    got2: dict[int, list] = {}
    for r in sorted(top2, key=lambda r: (r.vec_id, r.dist, r.cid)):
        got2.setdefault(r.vec_id, []).append(r.cid)
    assert got2 == brute(2)
    # keep_dist round-trips the exact double the scorer computed
    assert all(isinstance(r.dist, float) for r in top2)


def test_kmeans_fit_tie_breaks_to_lower_cid(spark):
    """`kmeans_fit`'s internal array-argmin (`_scored_expr` struct field
    order) must tie-break to the LOWER cid, exactly like
    `assign_clusters`' window form: a point equidistant to two seed
    centroids joins the lower-cid cluster. Pins the struct(dist, cid)
    field order against silent reordering (the assign_clusters tie test
    exercises the window path, not this one)."""
    from twitter_flink_spark.operators.clustering import kmeans_fit

    rows = [
        (0, [-1.0, 0.0]),  # seed cid 0
        (1, [1.0, 0.0]),   # seed cid 1
        (2, [0.0, 0.0]),   # equidistant to both seeds -> must pick cid 0
    ]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = {
        r.cid: (r.cent, r.n_vecs)
        for r in kmeans_fit(v, k=2, iters=1).collect()
    }
    assert cents[0][1] == 2 and cents[1][1] == 1  # tie joined cid 0
    assert all(abs(x - y) < 1e-9 for x, y in zip(cents[0][0], [-0.5, 0.0]))
    assert all(abs(x - y) < 1e-9 for x, y in zip(cents[1][0], [1.0, 0.0]))


def test_multiprobe_probes_cover_hamming_ball(spark):
    """Each (id, band, sig) row expands to the signature plus every
    1-bit-flip variant — the Hamming-distance-1 ball, deduplicated."""
    from twitter_flink_spark.operators.similarity import multiprobe_band_probes

    df = spark.createDataFrame(
        [(1, 0, "10"), (1, 1, "00")], "vec_id LONG, band INT, band_sig STRING"
    )
    rows = multiprobe_band_probes(df, r=2).collect()
    got = {(r.band, r.band_sig) for r in rows}
    assert got == {(0, "10"), (0, "00"), (0, "11"), (1, "00"), (1, "10"), (1, "01")}


def test_multiprobe_candidates_superset_of_single_probe(spark):
    """Multi-probe candidate pairs must contain every single-probe pair:
    probing extra buckets can only ADD recall, never lose a candidate."""
    import random

    from twitter_flink_spark.operators.similarity import (
        lsh_sign_bands,
        multiprobe_band_probes,
        random_hyperplanes,
    )

    rng = random.Random(7)
    vecs = [
        (i, [round(rng.gauss(0, 1), 3) for _ in range(8)]) for i in range(40)
    ]
    emb = spark.createDataFrame(vecs, "vec_id LONG, embedding ARRAY<DOUBLE>")
    planes = random_hyperplanes(n_planes=8, dim=8, seed=3)
    banded = lsh_sign_bands(emb, planes, bands=4)

    def pairs(q_side):
        c = banded.selectExpr("vec_id AS neighbor_id", "band", "band_sig")
        return {
            (r.query_id, r.neighbor_id)
            for r in q_side.join(c, on=["band", "band_sig"])
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id")
            .distinct()
            .collect()
        }

    single = pairs(banded.selectExpr("vec_id AS query_id", "band", "band_sig"))
    multi = pairs(
        multiprobe_band_probes(banded, r=2).selectExpr(
            "vec_id AS query_id", "band", "band_sig"
        )
    )
    assert single <= multi
    assert len(multi) > len(single)


def test_grouped_kmeans_fits_independent_codebooks(spark):
    """group_col codebooks must equal separately-fitted per-group runs."""
    from twitter_flink_spark.operators.clustering import kmeans_fit

    rows = []
    for i in range(12):
        # group 0 clusters around 0/10; group 1 around 100/200
        rows.append((i, 0, [float(i % 2 * 10), 1.0]))
        rows.append((i, 1, [float(100 + i % 2 * 100), 2.0]))
    df = spark.createDataFrame(
        rows, "vec_id LONG, sub INT, e ARRAY<DOUBLE>"
    )
    grouped = {
        (r.sub, r.cid): r.cent
        for r in kmeans_fit(df, k=2, iters=2, vec_col="e", group_col="sub")
        .collect()
    }
    for sub in (0, 1):
        solo = {
            r.cid: r.cent
            for r in kmeans_fit(
                df.where(F.col("sub") == sub), k=2, iters=2, vec_col="e"
            ).collect()
        }
        for cid, cent in solo.items():
            assert grouped[(sub, cid)] == cent


def test_codebook_cache_isolated_by_sf(spark):
    """The session fit cache must key on sf_dir — centroids fitted at one
    scale must never serve another (and the rebuilt frame must match a
    fresh fit exactly)."""
    from twitter_flink_spark.queries.similarity import _coarse_centroids

    a = {(r.cid, tuple(r.cent)) for r in
         _coarse_centroids(spark, "/root/testdata/sf0.001").collect()}
    b = {(r.cid, tuple(r.cent)) for r in
         _coarse_centroids(spark, "/root/testdata/sf0.01").collect()}
    a2 = {(r.cid, tuple(r.cent)) for r in
          _coarse_centroids(spark, "/root/testdata/sf0.001").collect()}
    assert a == a2  # cache hit reproduces the fit bit-for-bit
    assert a != b or len(a) == len(b)  # distinct sf entries exist independently


def test_doc_multiprobe_pairs_superset_of_single_probe(spark):
    """Multi-probe candidates include every exact-signature collision, so
    the verified pair set can only GROW."""
    from twitter_flink_spark.queries.similarity import (
        doc_neardup_lsh_multiprobe,
        doc_neardup_lsh_tfidf,
    )

    sf = "/root/testdata/sf0.001"
    single = {(r.doc_a, r.doc_b) for r in doc_neardup_lsh_tfidf(spark, sf).collect()}
    multi = {(r.doc_a, r.doc_b) for r in doc_neardup_lsh_multiprobe(spark, sf).collect()}
    assert single <= multi


def test_ivf_inc_index_probe_reads_one_cell_dir(spark):
    """The incremental IVF index's assignment table is PARTITIONED BY
    cid (the inverted-list layout): a probe's candidate fetch must open
    exactly one cid=<cell> dir — inputFiles-pinned — and the single-dir
    read must equal filtering the full assignment table to that cell
    (routing and layout agree)."""
    import os

    from twitter_flink_spark.operators.clustering import assign_clusters
    from twitter_flink_spark.queries.similarity import (
        _ensure_ivf_inc_index,
    )
    from twitter_flink_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    dest, split, (n0, n1, n2) = _ensure_ivf_inc_index(spark, sf)
    assert n0 > 0 and n1 > 0 and n2 == 0

    emb = load_table(spark, sf, "embeddings")
    probe_id = int(emb.agg(F.max("vec_id")).first()[0])
    cents = spark.read.parquet(os.path.join(dest, "_centroids"))
    probe = emb.where(F.col("vec_id") == probe_id).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    pcid = int(assign_clusters(probe, cents).first()["cid"])

    cell_dir = os.path.join(dest, "_assign", f"cid={pcid}")
    cell = spark.read.parquet(cell_dir)
    assert cell.inputFiles()  # the cell exists on disk
    assert all(cell_dir in f for f in cell.inputFiles())  # ONE dir

    full = spark.read.parquet(os.path.join(dest, "_assign"))
    # the probe fetch reads a strict subset of the assignment table
    assert len(cell.inputFiles()) < len(full.inputFiles())
    # single-dir read == cell filter over the full table (routing pins
    # the same cell the stored assignment has)
    a = sorted(r["vec_id"] for r in cell.collect())
    b = sorted(
        r["vec_id"] for r in full.where(F.col("cid") == pcid).collect()
    )
    assert a == b
    assert probe_id in a  # the probe's own stored row is in its cell


def test_ivf_refit_on_drift_fires_heals_and_noops(spark, tmp_path):
    """`ivf_refit_on_drift`: below threshold it is a PURE no-op (index
    untouched on disk); drifted data fires a full refit whose post state
    self-reports ratio 1; a crash-torn cutover (new assignments, old
    centroids) measures as inflated drift and the next run repairs it."""
    import os
    import shutil

    from twitter_flink_spark.operators.clustering import (
        assign_clusters,
        assigned_mean_dist,
        ivf_meta_df,
        ivf_refit_on_drift,
        kmeans_fit,
    )

    def vecs(lo, hi, shift=0.0):
        return spark.range(lo, hi).select(
            F.col("id").alias("vec_id"),
            F.array(
                *(
                    (F.col("id") % m).cast("double") + F.lit(shift)
                    for m in (3, 5, 7, 11)
                )
            ).alias("embedding"),
        )

    idx = str(tmp_path / "idx")
    os.makedirs(idx)
    corpus = vecs(0, 60)
    cents = kmeans_fit(corpus, k=4, iters=2).select("cid", "cent")
    cents.coalesce(1).write.parquet(os.path.join(idx, "_centroids"))
    disk = spark.read.parquet(os.path.join(idx, "_centroids"))
    v = corpus.select("vec_id", F.col("embedding").alias("e"))
    assign_clusters(v, disk).write.partitionBy("cid").parquet(
        os.path.join(idx, "_assign")
    )
    base = assigned_mean_dist(
        v, disk, spark.read.parquet(os.path.join(idx, "_assign"))
    )
    ivf_meta_df(spark, base, 4, 2).coalesce(1).write.parquet(
        os.path.join(idx, "_meta")
    )

    # 1. healthy index: pure no-op, nothing rewritten
    files_before = sorted(
        spark.read.parquet(os.path.join(idx, "_assign")).inputFiles()
    )
    r = ivf_refit_on_drift(spark, idx, corpus, threshold=1.5)
    assert r["fired"] is False and abs(r["ratio"] - 1.0) < 1e-9
    assert (
        sorted(spark.read.parquet(os.path.join(idx, "_assign")).inputFiles())
        == files_before
    )

    # 2. drift: shifted arrivals against frozen centroids -> refit fires
    newv = vecs(60, 100, shift=25.0).select(
        "vec_id", F.col("embedding").alias("e")
    )
    assign_clusters(newv, disk).write.mode("append").partitionBy(
        "cid"
    ).parquet(os.path.join(idx, "_assign"))
    allv = vecs(0, 60).union(vecs(60, 100, shift=25.0))
    r2 = ivf_refit_on_drift(spark, idx, allv, threshold=1.5)
    assert r2["fired"] is True and r2["ratio"] > 1.5
    r3 = ivf_refit_on_drift(spark, idx, allv, threshold=1.5)
    assert r3["fired"] is False and abs(r3["ratio"] - 1.0) < 1e-9

    # 3. torn cutover: old centroids resurface under the new assignments
    good = os.path.join(idx, "_centroids")
    from twitter_flink_spark.operators.skipping import _rm_committed

    shutil.rmtree(good + ".save", ignore_errors=True)
    shutil.copytree(good, good + ".save")  # follows the pointer symlink
    _rm_committed(good)  # the committed dest is a pointer symlink
    # rebuild STALE centroids (the pre-refit fit) in place
    cents.coalesce(1).write.parquet(good)
    r4 = ivf_refit_on_drift(spark, idx, allv, threshold=1.5)
    assert r4["fired"] is True  # mixed generation reads as drift
    r5 = ivf_refit_on_drift(spark, idx, allv, threshold=1.5)
    assert r5["fired"] is False and abs(r5["ratio"] - 1.0) < 1e-9


def _labeled_embeddings_dir(spark, tmp_path, rows):
    """Write a tiny embeddings.parquet a query's load_table can read."""
    import os

    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    return d


def test_knn_vote_flags_the_mislabeled_probe(spark, tmp_path):
    """A probe whose stored label disagrees with its 5 nearest
    neighbors' majority vote counts as incorrect; probes are exactly
    the vec_id % 37 == 0 rows."""
    from twitter_flink_spark.queries.similarity import (
        knn_label_vote_accuracy,
    )

    # cluster A around (1, 0): ids 0-5. id 0 is a probe but carries
    # the WRONG label b; its neighbors all vote a.
    rows = [(i, [1.0 + 0.01 * i, 0.0], "a") for i in range(1, 6)]
    rows.append((0, [1.0, 0.0], "b"))
    # cluster B around (0, 1): ids 37 and 74 are probes, labels agree.
    rows += [(37 + i, [0.01 * i, 1.0], "b") for i in range(1, 6)]
    rows += [(37, [0.0, 1.0], "b"), (74, [0.05, 1.0], "b")]
    sf = _labeled_embeddings_dir(spark, tmp_path, rows)

    got = {
        r["label"]: r
        for r in knn_label_vote_accuracy(spark, sf).collect()
    }
    # all three probes carry qlabel b; only id 0's vote disagrees
    assert set(got) == {"b"}
    assert got["b"]["n_probes"] == 3
    assert got["b"]["n_correct"] == 2
    assert abs(got["b"]["accuracy"] - round(2 / 3, 4)) < 1e-9


def test_centroid_separation_exact_on_two_clusters(spark, tmp_path):
    """Hand-computable corpus: two labels on a line, unit scatter,
    centroid distance 10 -> db_component 0.2 both ways."""
    from twitter_flink_spark.queries.similarity import (
        label_centroid_separation,
    )

    rows = [
        (1, [0.0, 0.0], "a"),
        (2, [2.0, 0.0], "a"),
        (3, [10.0, 0.0], "b"),
        (4, [12.0, 0.0], "b"),
    ]
    sf = _labeled_embeddings_dir(spark, tmp_path, rows)
    got = {
        r["label"]: r
        for r in label_centroid_separation(spark, sf).collect()
    }
    assert set(got) == {"a", "b"}
    for lab, other in (("a", "b"), ("b", "a")):
        assert got[lab]["n"] == 2
        assert abs(got[lab]["scatter"] - 1.0) < 1e-6
        assert got[lab]["nearest_label"] == other
        assert abs(got[lab]["db_component"] - 0.2) < 1e-6


def test_ivf_refit_on_imbalance_fires_and_noops(spark, tmp_path):
    """`ivf_refit_on_imbalance` (the skew-triggered sibling): balanced
    occupancy is a PURE no-op (index untouched on disk, trigger reads
    only the k-cell aggregate); a hot cell above threshold fires the
    shared full refit, after which the rebalanced index no-ops."""
    import os

    from twitter_flink_spark.operators.clustering import (
        assign_clusters,
        assigned_mean_dist,
        ivf_imbalance_factor,
        ivf_meta_df,
        ivf_refit_on_imbalance,
        kmeans_fit,
    )

    def vecs(lo, hi, shift=0.0):
        return spark.range(lo, hi).select(
            F.col("id").alias("vec_id"),
            F.array(
                *(
                    (F.col("id") % m).cast("double") + F.lit(shift)
                    for m in (3, 5, 7, 11)
                )
            ).alias("embedding"),
        )

    idx = str(tmp_path / "idx")
    os.makedirs(idx)
    corpus = vecs(0, 60)
    cents = kmeans_fit(corpus, k=4, iters=2).select("cid", "cent")
    cents.coalesce(1).write.parquet(os.path.join(idx, "_centroids"))
    disk = spark.read.parquet(os.path.join(idx, "_centroids"))
    v = corpus.select("vec_id", F.col("embedding").alias("e"))
    assign_clusters(v, disk).write.partitionBy("cid").parquet(
        os.path.join(idx, "_assign")
    )
    base = assigned_mean_dist(
        v, disk, spark.read.parquet(os.path.join(idx, "_assign"))
    )
    ivf_meta_df(spark, base, 4, 2).coalesce(1).write.parquet(
        os.path.join(idx, "_meta")
    )
    imb0 = ivf_imbalance_factor(spark, idx)

    # 1. threshold above current skew: pure no-op, nothing rewritten
    files_before = sorted(
        spark.read.parquet(os.path.join(idx, "_assign")).inputFiles()
    )
    r = ivf_refit_on_imbalance(spark, idx, corpus, threshold=imb0 + 0.1)
    assert r["fired"] is False and abs(r["imbalance"] - imb0) < 1e-9
    assert (
        sorted(spark.read.parquet(os.path.join(idx, "_assign")).inputFiles())
        == files_before
    )

    # 2. a shifted era piles into one cell -> skew spikes -> refit fires
    newv = vecs(60, 180, shift=25.0).select(
        "vec_id", F.col("embedding").alias("e")
    )
    assign_clusters(newv, disk).write.mode("append").partitionBy(
        "cid"
    ).parquet(os.path.join(idx, "_assign"))
    imb1 = ivf_imbalance_factor(spark, idx)
    assert imb1 > imb0  # the hot cell moved the statistic
    allv = vecs(0, 60).union(vecs(60, 180, shift=25.0))
    thr = (imb0 + imb1) / 2
    r2 = ivf_refit_on_imbalance(spark, idx, allv, threshold=thr)
    assert r2["fired"] is True and r2["imbalance"] == imb1
    imb2 = ivf_imbalance_factor(spark, idx)
    assert imb2 < imb1  # the refit genuinely rebalanced
    r3 = ivf_refit_on_imbalance(spark, idx, allv, threshold=thr)
    assert r3["fired"] is False and abs(r3["imbalance"] - imb2) < 1e-9
