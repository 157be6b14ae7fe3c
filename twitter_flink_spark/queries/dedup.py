"""Dedup queries over `documents` (north-star: SURVEY.md §2.3), each with a
DuckDB oracle computing byte-identical md5-based signatures."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from twitter_flink_spark.operators.dedup import MINHASH_K, simhash16
from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.staging import scratch_dir
from twitter_flink_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# Exact dedup (hash groupBy)


@register(
    "dedup_exact",
    oracle="""
SELECT text, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents
GROUP BY text
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup as a hash groupBy on the full text, keeping the lowest
    doc_id (deterministic — unlike dropDuplicates, whose survivor depends on
    partition order). At 100 TB: group on md5(text) instead to shrink
    shuffle keys; survivor selection is the same min-aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup


def _minhash_pair_ctes(k: int = MINHASH_K, bands: int = 8, ngram: int = 3,
                       threshold: float = 0.5,
                       doc_filter: str = "TRUE") -> str:
    """The shared CTE chain ending in `pairs` (verified near-dup pairs) —
    composed into both the pair oracle and the recursive clustering
    oracle. ``doc_filter`` restricts the corpus (the delete-oracle twin:
    pairs over documents minus the tombstoned set)."""
    r = k // bands
    h_cols = ",\n         ".join(
        f"min(md5('{i}:' || shingle)) AS h{i}" for i in range(k)
    )
    band_rows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, md5({concat}) AS band_hash FROM sig".format(
            b=b,
            concat=" || ".join(f"h{b * r + j}" for j in range(r)),
        )
        for b in range(bands)
    )
    return f"""tok AS (
  SELECT doc_id, str_split(text, ' ') AS toks FROM documents
  WHERE len(str_split(text, ' ')) >= {ngram} AND ({doc_filter})
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+{ngram - 1}], ' ') AS shingle
  FROM tok, unnest(range(1, len(toks) - {ngram - 2})) AS t(i)
),
sig AS (
  SELECT doc_id,
         {h_cols}
  FROM sh GROUP BY doc_id
),
bands AS (
{band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
),
pairs AS (
  SELECT i.doc_a, i.doc_b,
         round(i.n_inter * 1.0 / (za.sz + zb.sz - i.n_inter), 6) AS jaccard
  FROM inter i
  JOIN sz za ON za.doc_id = i.doc_a
  JOIN sz zb ON zb.doc_id = i.doc_b
  WHERE round(i.n_inter * 1.0 / (za.sz + zb.sz - i.n_inter), 6) >= {threshold}
)"""


def _minhash_oracle() -> str:
    return f"""
WITH {_minhash_pair_ctes()}
SELECT doc_a, doc_b, jaccard FROM pairs
"""


def _cluster_oracle() -> str:
    """Connected components over the near-dup pairs via recursive label
    reachability: each node's cluster id = min doc_id reachable."""
    return f"""
WITH RECURSIVE {_minhash_pair_ctes()},
bidir AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
walk(node, label) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM bidir)
  UNION
  SELECT e.b, w.label FROM walk w JOIN bidir e ON e.a = w.node
)
SELECT node AS doc_id, min(label) AS cluster_id
FROM walk GROUP BY node
"""


def _staged_minhash(spark: SparkSession, sf_dir: str):
    """Shingles + banded MinHash signatures staged ONCE per scale
    factor: both are pure deterministic functions of the documents
    table (md5-derived), yet eight pair-consuming queries re-ran the
    shingle -> sign -> band pipeline per run. The staged tables hold
    (doc_id, shingle) and (doc_id, band, band_hash); the banding
    self-join, Jaccard verification, and everything downstream — the
    parts each query actually prices — still run per query.
    Cross-process write-once via `stage_once`."""
    import os

    from twitter_flink_spark.operators.dedup import (
        doc_shingles,
        lsh_bands,
        minhash_signature,
    )
    from twitter_flink_spark.sources.staging import stage_once

    def _build(p: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        sh = doc_shingles(spread(docs, "doc_id")).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        sh.write.mode("overwrite").parquet(os.path.join(p, "shingles"))
        lsh_bands(minhash_signature(sh)).write.mode(
            "overwrite"
        ).parquet(os.path.join(p, "bands"))
        sh.unpersist()

    dest, _ = stage_once("minhashprof", sf_dir, _build)
    return (
        spark.read.parquet(os.path.join(dest, "bands")),
        spark.read.parquet(os.path.join(dest, "shingles")),
    )


def _staged_shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DOC shingle sets (doc_id, sh array) staged once per scale
    factor — the verify-side companion of `_staged_minhash`: one row per
    doc instead of one per shingle, so a candidate-scoped exact-Jaccard
    is two broadcast joins plus `array_intersect`, never a scan (or
    shuffle) of the exploded shingle table. A pure deterministic
    function of the staged shingles."""
    import os

    from twitter_flink_spark.sources.staging import stage_once

    def _build(p: str) -> None:
        _, sh = _staged_minhash(spark, sf_dir)
        sh.groupBy("doc_id").agg(
            F.collect_set("shingle").alias("sh")
        ).write.mode("overwrite").parquet(p)

    dest, _ = stage_once("minhashsets", sf_dir, _build)
    return spark.read.parquet(dest)


def _near_dup_pairs_staged(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """The standard verified near-dup pair set (MinHash 16 / 8 bands /
    3-shingles / J >= threshold) from the staged signature tables —
    byte-identical to `minhash_near_dup_pairs` on the documents table,
    minus the per-run re-signing."""
    from twitter_flink_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
    )

    bands, sh = _staged_minhash(spark, sf_dir)
    return jaccard_verify(lsh_candidate_pairs(bands), sh, threshold)


def _fresh_lsh_index_copy(spark: SparkSession, sf_dir: str) -> str:
    """A private, mutable copy of the PRISTINE corpus LSH index: the
    build (shingle + sign + band the whole corpus) is staged ONCE per
    sf (`stage_once`), and each mutating consumer (the delete/compact
    lifecycle queries) copies the small parquet tree instead of paying
    a full re-build per run — the same copy-then-mutate pattern as the
    IVF delete query. Returns the copy's index dir."""
    import os
    import shutil

    from twitter_flink_spark.operators.dedup import lsh_index_build
    from twitter_flink_spark.sources.staging import scratch_dir, stage_once

    def _build(p: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        lsh_index_build(spark, docs, os.path.join(p, "index"))

    # tag bumped when the index layout went SEGMENTED (seg=N/ dirs) so
    # a stale flat fixture can never serve the legacy-compact path to
    # the delete/compact lifecycle queries
    dest, _ = stage_once("lshpristine-seg", sf_dir, _build)
    work = os.path.join(scratch_dir("lshidxcopy"), "index")
    shutil.copytree(os.path.realpath(os.path.join(dest, "index")), work)
    return work


@register("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(8 bands) near-dup pairs with exact shingle-Jaccard
    verification at >= 0.5. The oracle recomputes the identical md5
    signatures, so candidate generation matches exactly."""
    return _near_dup_pairs_staged(spark, sf_dir)


@register("dedup_cluster_components", oracle=_cluster_oracle())
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup CLUSTERS: iterative connected components
    (min-label propagation, operators/graph.py) over the MinHash-LSH pair
    graph. cluster_id = min doc_id of the component — the survivor a dedup
    pipeline keeps. Oracle: recursive-CTE reachability over the identical
    pair set (Spark has no recursive SQL; the iterative DataFrame loop is
    the engine's equivalent, and this query proves it reaches the same
    fixed point)."""
    from twitter_flink_spark.operators.graph import connected_components

    pairs = _near_dup_pairs_staged(spark, sf_dir)
    return connected_components(pairs)


@register("dedup_cluster_star", oracle=_cluster_oracle())
def dedup_cluster_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering as `dedup_cluster_components`, computed with the
    alternating large-star/small-star formulation (Kiveris et al.) —
    O(log n) rounds instead of O(diameter), the variant that survives
    adversarial long-chain graphs at scale. Identical fixed point, same
    recursive-CTE oracle."""
    from twitter_flink_spark.operators.graph import connected_components_star

    pairs = _near_dup_pairs_staged(spark, sf_dir)
    return connected_components_star(pairs)


# ---------------------------------------------------------------------------
# n-gram Jaccard (brute verification of a bounded candidate set)


@register(
    "ngram_jaccard_same_source",
    oracle="""
WITH tok AS (
  SELECT doc_id, source, str_split(text, ' ') AS toks FROM documents
  WHERE len(str_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, source, array_to_string(toks[i:i+2], ' ') AS shingle
  FROM tok, unnest(range(1, len(toks) - 1)) AS t(i)
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS n_inter
  FROM sh sa
  JOIN sh sb ON sb.source = sa.source AND sb.shingle = sa.shingle
            AND sa.doc_id < sb.doc_id
  GROUP BY 1, 2
),
j AS (
  SELECT i.doc_a, i.doc_b,
         round(i.n_inter * 1.0 / (za.sz + zb.sz - i.n_inter), 6) AS jaccard
  FROM inter i
  JOIN sz za ON za.doc_id = i.doc_a
  JOIN sz zb ON zb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.3
""",
)
def ngram_jaccard_same_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard >= 0.3 for pairs WITHIN the same `source`
    (blocking key bounds the pair space — the classic partition-then-compare
    dedup shape; at 100 TB the join shuffles on (source, shingle), never a
    cross product)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 3)),
        )
    )
    sh = (
        spread(docs, "doc_id")
        .where(F.size(toks) >= 3)
        .select("doc_id", "source", F.explode(shingles).alias("shingle"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "source", "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "source", "shingle")
    inter = (
        sa.join(sb, on=["source", "shingle"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")),
            on="doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")),
            on="doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.3)
    )


# ---------------------------------------------------------------------------
# SimHash fingerprints


@register(
    "simhash_fingerprints",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents
),
hashed AS (
  SELECT doc_id, md5(token) AS h FROM tok WHERE token <> ''
),
sums AS (
  SELECT doc_id,
         """ + ",\n         ".join(
        f"sum(CASE WHEN strpos('0123456789abcdef', substring(h, {j + 1}, 1)) - 1 >= 8 "
        f"THEN 1 ELSE -1 END) AS s{j}"
        for j in range(16)
    ) + """
  FROM hashed GROUP BY doc_id
)
SELECT doc_id,
       """ + " || ".join(
        f"(CASE WHEN s{j} >= 0 THEN '1' ELSE '0' END)" for j in range(16)
    ) + """ AS simhash
FROM sums
""",
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document (md5-nibble majority vote), emitted as a
    bit string — portable across engines, groupable for near-dup banding."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash16(docs)


def _canonical_oracle() -> str:
    """Clustering oracle extended with survivor selection: per cluster keep
    the longest document (ties: lowest doc_id)."""
    return f"""
WITH RECURSIVE {_minhash_pair_ctes()},
bidir AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
walk(node, label) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM bidir)
  UNION
  SELECT e.b, w.label FROM walk w JOIN bidir e ON e.a = w.node
),
comp AS (
  SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node
),
ranked AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars,
         row_number() OVER (
           PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, c.doc_id
         ) AS rn
  FROM comp c JOIN documents d USING (doc_id)
)
SELECT cluster_id,
       min(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc,
       count(*) AS n_members,
       CAST(sum(n_chars) AS BIGINT) AS member_chars
FROM ranked
GROUP BY cluster_id
"""


@register("dedup_select_canonical", oracle=_canonical_oracle())
def dedup_select_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END of the dedup pipeline: near-dup pairs → clusters (star CC)
    → one surviving document per cluster (longest text, ties to the lowest
    doc_id). What a 100 TB dedup job actually emits: a keep-list. The
    cluster assignment is tiny next to the corpus, so the join back to
    `documents` broadcasts it; survivor selection is one windowed rank per
    cluster."""
    from twitter_flink_spark.operators.graph import (
        connected_components_adaptive,
    )
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    pairs = _near_dup_pairs_staged(spark, sf_dir)
    # one count job over the staged pair set buys the adaptive CC's
    # driver union-find at bounded grain (identical min labels; the
    # star path takes over past the threshold — see the operator)
    clusters = connected_components_adaptive(pairs, pairs.count())
    member = F.broadcast(clusters).join(docs, "doc_id").select(
        "cluster_id", "doc_id", "n_chars"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ranked = member.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("cluster_id").agg(
        F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("canonical_doc"),
        F.count(F.lit(1)).alias("n_members"),
        F.sum("n_chars").cast("long").alias("member_chars"),
    )


@register(
    "er_fuzzy_name_pairs",
    oracle="""
WITH names AS (
  SELECT DISTINCT p_name FROM part
),
blocked AS (
  SELECT p_name,
         str_split(p_name, ' ')[len(str_split(p_name, ' '))] AS block
  FROM names
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
FROM blocked a JOIN blocked b
  ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
""",
)
def er_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocking + edit-distance verify — the standard
    fuzzy-matching shape (dedupe product names, merge customer records):
    candidate pairs come from an equi-join on a cheap blocking key (the
    last name token), and the expensive pairwise Levenshtein runs
    ONLY inside blocks. All-pairs edit distance is O(n²) and unshardable;
    blocking makes the join an ordinary hash-partitioned equi-join whose
    cost is Σ blocksize² — the knob (block key granularity) trades recall
    for compute, exactly like LSH banding in `dedup_minhash_lsh`. Distinct
    names first: row-level duplicates would square the pair count for no
    information."""
    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    toks = F.split("p_name", " ")
    blocked = names.select(
        "p_name",
        F.element_at(toks, F.size(toks)).alias("block"),
    )
    a = blocked.select(F.col("p_name").alias("name_a"), "block")
    b = blocked.select(F.col("p_name").alias("name_b"), "block")
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "block")
        .where(F.col("name_a") < F.col("name_b"))
        .where(dist <= 3)
        .select("name_a", "name_b", dist.cast("int").alias("dist"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter incremental dedup (SURVEY §12 item 4)

_BLOOM_M = 131072  #: filter bits (2^17); ~10x the prior shingle count
_BLOOM_K = 3  #: hash functions; fp/shingle ~ (1 - e^(-kn/m))^k ~ 1e-2
_BLOOM_NGRAM = 3


def _bloom_digit_sum(expr: str) -> str:
    """hex -> BIGINT via positional digit sums (DuckDB has no conv());
    same construction as queries/scale.py::_aes_oracle."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {j + 1}, 1)) - 1) "
        f"* {16 ** (8 - 1 - j)}"
        for j in range(8)
    )
    return f"({terms})"


def _bloom_oracle(m: int = _BLOOM_M, k: int = _BLOOM_K,
                  ngram: int = _BLOOM_NGRAM) -> str:
    def hash_rows(src: str, cols: str) -> str:
        return "\n  UNION ALL\n".join(
            f"  SELECT {cols}substr(md5('bloom{i}:' || shingle), 1, 8) AS hx"
            f" FROM {src}"
            for i in range(k)
        )

    return f"""
WITH tok AS (
  SELECT doc_id, source, str_split(text, ' ') AS toks FROM documents
  WHERE len(str_split(text, ' ')) >= {ngram}
),
sh AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(toks[i:i+{ngram - 1}], ' ') AS shingle
  FROM tok, unnest(range(1, len(toks) - {ngram - 2})) AS t(i)
),
prior_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE length(source) = 4
),
ph AS (
{hash_rows("prior_sh", "")}
),
bloom AS (SELECT DISTINCT {_bloom_digit_sum("hx")} % {m} AS bit_pos FROM ph),
inc_sh AS (SELECT doc_id, shingle FROM sh WHERE length(source) = 5),
iph AS (
{hash_rows("inc_sh", "doc_id, shingle, ")}
),
ipos AS (
  SELECT doc_id, shingle, {_bloom_digit_sum("hx")} % {m} AS bit_pos FROM iph
),
shhit AS (
  SELECT i.doc_id, i.shingle, CAST(count(b.bit_pos) = {k} AS INT) AS hit
  FROM ipos i LEFT JOIN bloom b ON b.bit_pos = i.bit_pos
  GROUP BY 1, 2
),
perdoc AS (
  SELECT doc_id, count(*) AS n_shingles, CAST(sum(hit) AS BIGINT) AS n_hits
  FROM shhit GROUP BY 1
)
SELECT d.doc_id, d.source, p.n_shingles, p.n_hits,
       CAST(p.n_hits * 2 >= p.n_shingles AS INT) AS maybe_dup
FROM perdoc p JOIN documents d ON d.doc_id = p.doc_id
"""


@register("bloom_incremental_dedup", oracle=_bloom_oracle())
def bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup against a PRIOR corpus via a portable
    bloom filter (SURVEY §12): sources 'src0'..'src9' are the already-
    ingested corpus, 'src10'..'src19' the incoming batch. The prior
    corpus's 3-gram shingles populate a bloom bit-set
    (`operators/dedup.py::shingle_bloom_bits`, md5 bit positions so the
    oracle recomputes it exactly); each incoming doc reports how many of
    its shingles the filter claims to have seen and is flagged maybe_dup
    at >= 50% hit ratio.

    The 100 TB shape is the point: the ONLY artifact carried between
    ingest runs is the bit-set — bounded by m (2^17 positions) no matter
    how big the prior corpus grows — broadcast to every probe task, so
    re-ingest never rescans or joins prior data. Bloom guarantees no
    false negatives (a true near-dup's shared shingles ALL hit), and the
    fp rate is a documented function of (k, n, m); flagged docs go to an
    exact verify (e.g. `dedup_minhash_lsh`), which is the standard
    two-tier design."""
    from twitter_flink_spark.operators.dedup import (
        bloom_shingle_hits,
        doc_shingles,
        shingle_bloom_bits,
    )

    docs = load_table(spark, sf_dir, "documents")
    prior_sh = doc_shingles(
        spread(docs.where(F.length("source") == 4), "doc_id"),
        ngram=_BLOOM_NGRAM,
    )
    bloom = shingle_bloom_bits(prior_sh, m=_BLOOM_M, k=_BLOOM_K)
    inc_sh = doc_shingles(
        spread(docs.where(F.length("source") == 5), "doc_id"),
        ngram=_BLOOM_NGRAM,
    )
    perdoc = bloom_shingle_hits(inc_sh, bloom, m=_BLOOM_M, k=_BLOOM_K)
    return perdoc.join(
        docs.select("doc_id", "source"), on="doc_id"
    ).select(
        "doc_id",
        "source",
        "n_shingles",
        "n_hits",
        (F.col("n_hits") * 2 >= F.col("n_shingles")).cast("int").alias(
            "maybe_dup"
        ),
    )


_PPJ_THRESHOLD = 0.5


@register(
    "prefix_filter_jaccard_join",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, str_split(text, ' ') AS toks FROM documents
  WHERE len(str_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
  FROM tok, unnest(range(1, len(toks) - 1)) AS t(i)
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
  FROM sh a JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       round(i.ni * 1.0 / (za.sz + zb.sz - i.ni), 6) AS jaccard
FROM inter i JOIN sz za ON za.doc_id = i.doc_a
             JOIN sz zb ON zb.doc_id = i.doc_b
WHERE i.ni * 1.0 / (za.sz + zb.sz - i.ni) >= {_PPJ_THRESHOLD}
""",
)
def prefix_filter_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs shingle-set similarity join (3-gram Jaccard >=
    0.5) via prefix filtering
    (`operators/dedup.py::prefix_filter_jaccard_pairs`) — the
    recall-lossless complement to `dedup_minhash_lsh` at identical
    semantics: banding trades recall for candidates, prefix filtering
    provably loses nothing (a qualifying pair must share a rarest-first
    prefix shingle), so the ORACLE IS THE NAIVE ALL-PAIRS JOIN — the
    correctness gate certifies the optimization semantics-preserving
    rather than recomputing the same candidate set on both engines."""
    from twitter_flink_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(
        spread(docs, "doc_id"), threshold=_PPJ_THRESHOLD
    )


_PPJ_BLOCK_THRESHOLD = 0.3


@register(
    "ngram_jaccard_prefix_same_source",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source, str_split(text, ' ') AS toks FROM documents
  WHERE len(str_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, source, array_to_string(toks[i:i+2], ' ') AS shingle
  FROM tok, unnest(range(1, len(toks) - 1)) AS t(i)
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
  FROM sh a JOIN sh b ON b.source = a.source AND b.shingle = a.shingle
                     AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       round(i.ni * 1.0 / (za.sz + zb.sz - i.ni), 6) AS jaccard
FROM inter i JOIN sz za ON za.doc_id = i.doc_a
             JOIN sz zb ON zb.doc_id = i.doc_b
WHERE i.ni * 1.0 / (za.sz + zb.sz - i.ni) >= {_PPJ_BLOCK_THRESHOLD}
""",
)
def ngram_jaccard_prefix_same_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`ngram_jaccard_same_source` semantics (3-gram Jaccard >= 0.3
    within each `source` block) computed with the PPJoin
    prefix+length+positional machinery instead of the full shingle
    self-join — SURVEY §13's declared port of the positional bound to
    the blocked n-gram family. Document frequencies sort rarest-first
    WITHIN each source (both members of a candidate pair share the
    block, so the shared order keeps every filter lossless), the prefix
    index joins on (source, shingle), and only each doc's first
    |x| - ceil(t|x|) + 1 shingles are indexed — at t=0.3 that is ~70%
    of the shingle table, but the rarest-first prefix keeps candidate
    lists short where it matters (the boilerplate shingles all sit
    OUTSIDE the prefix). The ORACLE is the naive blocked all-pairs
    join, certifying the optimization lossless rather than recomputing
    the same candidate set on both engines."""
    from twitter_flink_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(
        spread(docs, "doc_id"),
        threshold=_PPJ_BLOCK_THRESHOLD,
        block_col="source",
    )


# ---------------------------------------------------------------------------
# Substring-level duplication (duplicated n-gram span coverage)

_SPAN_N = 5  #: span gram width (tokens)


@register(
    "duplicate_ngram_span_fraction",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, t.i AS pos,
         array_to_string(toks[t.i:t.i + {_SPAN_N - 1}], ' ') AS gram,
         len(toks) AS n_tok
  FROM tok, unnest(range(1, len(toks) - {_SPAN_N - 2})) AS t(i)
),
dup AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram
  ) WHERE nd >= 2
),
ds AS (SELECT g.doc_id, g.pos, g.n_tok FROM g JOIN dup USING (gram)),
cov AS (
  SELECT doc_id, n_tok, pos,
         least({_SPAN_N},
               coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                        pos + {_SPAN_N}) - pos) AS cov
  FROM ds
),
per AS (
  SELECT doc_id, count(*) AS n_dup_grams, sum(cov) AS covered
  FROM cov GROUP BY doc_id
),
alln AS (SELECT doc_id, len(toks) AS n_tok FROM tok WHERE len(toks) >= {_SPAN_N})
SELECT a.doc_id, CAST(a.n_tok AS BIGINT) AS n_tokens,
       CAST(coalesce(p.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(coalesce(p.covered, 0) AS BIGINT) AS covered_tokens,
       floor(coalesce(p.covered, 0) * 1000000.0 / a.n_tok) / 1000000.0
         AS dup_fraction
FROM alln a LEFT JOIN per p USING (doc_id)
""",
)
def duplicate_ngram_span_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Substring-level duplication profile — per document, the fraction
    of its token positions covered by a 5-gram that also occurs in at
    least one OTHER document: the span-coverage metric behind
    substring-dedup of LLM training corpora (removing long repeated
    spans rather than whole near-dup documents; suffix-array pipelines
    compute the same cross-document repeated-span mass). Output:
    (doc_id, n_tokens, n_dup_grams, covered_tokens, dup_fraction).

    Spark-first shape, two bounded shuffles: (1) gram-keyed — a partial
    count-distinct marks grams seen in >= 2 docs (at 100 TB you'd key on
    xxhash64(gram) so the exchange carries 8-byte keys; the fixture
    joins the gram string so the oracle is byte-identical), the doc's
    gram rows semi-join the duplicated set; (2) doc-keyed — overlapping
    fixed-width spans [pos, pos+4] merge into their interval union
    with ONE lead() window (sorted starts: each span contributes
    min(5, next_start - start) covered tokens), never materializing
    per-position rows. Coverage is exact integer arithmetic; the single
    final division is correctly rounded on both engines."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = spread(docs, "doc_id").select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"),
    )
    g = tok.select(
        "doc_id",
        F.size("toks").alias("n_tok"),
        # CASE guard: Spark's sequence(1, 0) auto-steps DOWN to [1, 0]
        # (and slice start 0 then throws) — short docs must yield an
        # EMPTY gram list, matching the oracle's empty range()
        F.posexplode(
            F.expr(
                f"CASE WHEN size(toks) >= {_SPAN_N} THEN "
                f"transform(sequence(1, size(toks) - {_SPAN_N - 1}),"
                f" i -> array_join(slice(toks, i, {_SPAN_N}), ' ')) "
                f"ELSE array() END"
            )
        ).alias("pos0", "gram"),
    ).select(
        "doc_id", "n_tok", (F.col("pos0") + 1).alias("pos"), "gram"
    )
    dup = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram")
    )
    ds = g.join(dup, "gram").select("doc_id", "n_tok", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    cov = ds.withColumn(
        "cov",
        F.least(
            F.lit(_SPAN_N),
            F.coalesce(F.lead("pos").over(w), F.col("pos") + _SPAN_N)
            - F.col("pos"),
        ),
    )
    per = cov.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_grams"),
        F.sum("cov").alias("covered"),
    )
    alln = tok.select("doc_id", F.size("toks").alias("n_tok")).where(
        F.col("n_tok") >= _SPAN_N
    )
    return alln.join(per, "doc_id", "left").select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tokens"),
        F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
        F.coalesce("covered", F.lit(0)).cast("long").alias("covered_tokens"),
        # floor-quantize, not round: the last compared step on a double
        # must not sit on HALF_UP vs scaled-round boundaries
        (
            F.floor(
                F.coalesce("covered", F.lit(0)) * 1000000.0 / F.col("n_tok")
            )
            / 1e6
        ).alias("dup_fraction"),
    )


# ---------------------------------------------------------------------------
# SimHash Hamming-distance near-dup JOIN (band index over the fingerprints)

_SIMHASH_HAM_MAX = 1  #: max Hamming distance (16-bit fingerprints, 4 bands)


def _simhash_sig_cte() -> str:
    sums = ",\n         ".join(
        f"sum(CASE WHEN strpos('0123456789abcdef', substring(h, {j + 1}, 1))"
        f" - 1 >= 8 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(16)
    )
    bits = " || ".join(
        f"(CASE WHEN s{j} >= 0 THEN '1' ELSE '0' END)" for j in range(16)
    )
    return f"""tok AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents
),
hashed AS (
  SELECT doc_id, md5(token) AS h FROM tok WHERE token <> ''
),
sums AS (
  SELECT doc_id,
         {sums}
  FROM hashed GROUP BY doc_id
),
sig AS (
  SELECT doc_id, {bits} AS simhash FROM sums
)"""


def _simhash_pairs_oracle() -> str:
    ham = " + ".join(
        f"(CASE WHEN substring(a.simhash, {j + 1}, 1) <> "
        f"substring(b.simhash, {j + 1}, 1) THEN 1 ELSE 0 END)"
        for j in range(16)
    )
    import itertools

    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {i} AS band, substring(simhash, {b1 * 4 + 1}, 4)"
        f" || substring(simhash, {b2 * 4 + 1}, 4) AS band_bits FROM sig"
        for i, (b1, b2) in enumerate(itertools.combinations(range(4), 2))
    )
    return f"""
WITH {_simhash_sig_cte()},
bands AS (
{band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band, band_bits)
  WHERE a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b, CAST({ham} AS INTEGER) AS hamming
FROM cand c
JOIN sig a ON a.doc_id = c.doc_a
JOIN sig b ON b.doc_id = c.doc_b
WHERE {ham} <= {_SIMHASH_HAM_MAX}
"""


@register("simhash_hamming_pairs", oracle=_simhash_pairs_oracle())
def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup JOIN: pairs of documents whose 16-bit SimHash
    fingerprints differ in <= 1 bit, found via the multi-table band
    index (Manku et al., WWW'07): split the fingerprint into 4 bands of
    4 bits — a pair with Hamming distance <= 1 has its one differing
    bit in at most ONE band, so at least one of the 6 band PAIRS
    (8 bits) matches exactly, and the 6-table band-pair equi-self-join
    is a lossless candidate generator (pigeonhole in Hamming space,
    same argument as MinHash prefix filtering) with far shorter
    candidate lists than single 4-bit bands (measured at sf0.01:
    35,932 candidate pairs vs 88,735 single-band, 4,861 true results);
    the 16-term bit comparison only runs on candidates. Completes the simhash family: `simhash_
    fingerprints` emits the sketch, this query performs the actual
    near-dup retrieval over it. At 100 TB the band-pair join shuffles
    on (pair_id, 8 bits) — 1,536 distinct keys would still skew, so a
    real deployment widens fingerprints to 64 bits (4 bands of 16 →
    pair keys of 32 bits; this fixture's 16-bit portable fingerprint
    keeps the oracle byte-identical); candidate verification stays
    per-pair either way."""
    docs = load_table(spark, sf_dir, "documents")
    sig = simhash16(docs).persist(StorageLevel.MEMORY_AND_DISK)
    import itertools

    # the full 16-bit fingerprint RIDES the band rows (16 extra chars on
    # the band shuffle) so the Hamming verification runs INSIDE the
    # self-join's output stage: candidates that fail the distance cut
    # die before the distinct, and the two doc-keyed joins back to the
    # signature table — two more shuffles of the whole candidate set —
    # disappear. The distinct then dedups only TRUE pairs (hamming is a
    # pure function of the pair, so dedup-after-verify is identical to
    # the previous verify-after-dedup).
    bands = None
    for i, (b1, b2) in enumerate(itertools.combinations(range(4), 2)):
        part = sig.select(
            "doc_id",
            F.lit(i).alias("band"),
            F.concat(
                F.substring("simhash", b1 * 4 + 1, 4),
                F.substring("simhash", b2 * 4 + 1, 4),
            ).alias("band_bits"),
            "simhash",
        )
        bands = part if bands is None else bands.unionByName(part)
    ham = sum(
        (
            F.substring("sh_a", j + 1, 1) != F.substring("sh_b", j + 1, 1)
        ).cast("int")
        for j in range(16)
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        "band",
        "band_bits",
        F.col("simhash").alias("sh_a"),
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        "band",
        "band_bits",
        F.col("simhash").alias("sh_b"),
    )
    return (
        a.join(b, on=["band", "band_bits"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= _SIMHASH_HAM_MAX)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Source-level similarity matrix (corpus-vs-corpus token Jaccard)


@register(
    "source_similarity_jaccard",
    oracle="""
WITH st AS (
  SELECT DISTINCT source,
         unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS token
  FROM documents
),
sz AS (SELECT source, count(*) AS sz FROM st GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS ni
  FROM st a JOIN st b ON b.token = a.token AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b,
       CAST(i.ni AS BIGINT) AS n_shared_tokens,
       floor(i.ni * 1000000.0 / (za.sz + zb.sz - i.ni)) / 1000000.0
         AS jaccard
FROM inter i
JOIN sz za ON za.source = i.source_a
JOIN sz zb ON zb.source = i.source_b
""",
)
def source_similarity_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus-level similarity matrix: token-set Jaccard between every
    pair of SOURCES — the collection-vs-collection view of dedup
    (two sources with high vocabulary Jaccard are candidate mirrors or
    re-crawls of each other; the doc-level joins then confirm). The
    document table reduces FIRST to distinct (source, token) — sources
    x vocab rows, far below corpus size — so the token self-join runs
    on the reduced grain and the output is sources^2/2 rows. Same
    blocked-join discipline as the doc-level family; jaccard
    floor-quantizes onto the 1e-6 grid."""
    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select(
            "source",
            F.explode(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("token"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sz = st.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    a = st.select(F.col("source").alias("source_a"), "token")
    b = st.select(F.col("source").alias("source_b"), "token")
    inter = (
        a.join(b, "token")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    return (
        inter.join(
            F.broadcast(
                sz.select(
                    F.col("source").alias("source_a"),
                    F.col("sz").alias("sz_a"),
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sz.select(
                    F.col("source").alias("source_b"),
                    F.col("sz").alias("sz_b"),
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            F.col("ni").cast("long").alias("n_shared_tokens"),
            (
                F.floor(
                    F.col("ni")
                    * 1000000.0
                    / (F.col("sz_a") + F.col("sz_b") - F.col("ni"))
                )
                / 1e6
            ).alias("jaccard"),
        )
    )


def _leakage_safe_split_oracle() -> str:
    return f"""
WITH RECURSIVE {_minhash_pair_ctes()},
bidir AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
walk(node, label) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM bidir)
  UNION
  SELECT e.b, w.label FROM walk w JOIN bidir e ON e.a = w.node
),
cl AS (SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node),
assigned AS (
  SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
),
labeled AS (
  SELECT doc_id, cluster_id,
         CASE WHEN strpos('0123456789abcdef',
                substr(md5('lsplit:' || cluster_id), 1, 1)) - 1 < 13
              THEN 'train' ELSE 'heldout' END AS split
  FROM assigned
)
SELECT l.split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT l.cluster_id) AS BIGINT) AS n_clusters,
       CAST(sum(CASE WHEN l.cluster_id <> l.doc_id OR l.doc_id IN
                (SELECT doc_id FROM cl) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_in_nontrivial_cluster
FROM labeled l GROUP BY l.split
"""


@register("leakage_safe_split", oracle=_leakage_safe_split_oracle())
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/heldout split: assignment hashes the dedup
    CLUSTER id, not the document id — every member of a near-dup
    cluster lands in the SAME split, so a heldout document can never
    have a near-duplicate in training (the contamination mode a
    doc-keyed split cannot prevent, and the reason eval suites split by
    cluster after dedup). Clusters come from the same MinHash-LSH +
    connected-components fixed point as `dedup_cluster_components`;
    singleton documents are their own cluster. The ~13/16 hash
    boundary targets ~80/20; the emitted surface is per-split doc and
    cluster counts plus how many docs sit in non-trivial clusters (the
    rows whose placement the cluster keying actually changed)."""
    from twitter_flink_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = _near_dup_pairs_staged(spark, sf_dir)
    cl = connected_components(pairs)
    assigned = docs.select("doc_id").join(cl, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        F.col("cluster_id").isNotNull().alias("in_cluster"),
    )
    nibble = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("lsplit:"), F.col("cluster_id").cast("string")
                    )
                ),
                1,
                1,
            ),
        )
        - 1
    )
    labeled = assigned.select(
        "doc_id",
        "cluster_id",
        "in_cluster",
        F.when(nibble < 13, "train").otherwise("heldout").alias("split"),
    )
    return labeled.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("cluster_id").cast("long").alias("n_clusters"),
        F.sum(F.col("in_cluster").cast("int"))
        .cast("long")
        .alias("n_in_nontrivial_cluster"),
    )


def _compression_oracle() -> str:
    return f"""
WITH RECURSIVE {_minhash_pair_ctes()},
bidir AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
walk(node, label) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM bidir)
  UNION
  SELECT e.b, w.label FROM walk w JOIN bidir e ON e.a = w.node
),
cl AS (SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node),
assigned AS (
  SELECT d.doc_id, d.n_chars, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
),
near AS (
  SELECT count(DISTINCT cluster_id) AS n_near,
         sum(n_chars) AS all_chars
  FROM assigned
),
keepers AS (
  SELECT sum(n_chars) AS kept_chars FROM (
    SELECT cluster_id, arg_min(n_chars, doc_id) AS n_chars
    FROM assigned GROUP BY cluster_id
  )
),
exact AS (SELECT count(DISTINCT text) AS n_exact FROM documents),
tot AS (SELECT count(*) AS n_docs FROM documents)
SELECT CAST(tot.n_docs AS BIGINT) AS n_docs,
       CAST(exact.n_exact AS BIGINT) AS n_after_exact,
       CAST(near.n_near AS BIGINT) AS n_after_near,
       CAST(near.all_chars AS BIGINT) AS total_chars,
       CAST(keepers.kept_chars AS BIGINT) AS kept_chars,
       floor((near.all_chars - keepers.kept_chars) * 1000000.0
             / near.all_chars) / 1000000.0 AS chars_removed_frac
FROM tot, exact, near, keepers
"""


@register("dedup_compression_summary", oracle=_compression_oracle())
def dedup_compression_summary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dedup pipeline's HEADLINE row: corpus size before dedup,
    after exact dedup, after near-dedup (MinHash-LSH + CC clusters,
    singletons counted as their own cluster), and the character mass
    removed when each cluster keeps its min-doc_id survivor — the
    one-line business case ("dedup shrinks this corpus by X%") that
    `dedup_cluster_size_histogram` breaks down by cluster size.
    Survivor selection pins (doc_id ASC) so kept_chars is
    deterministic. All aggregates run on grains already reduced by the
    shared pair/cluster machinery; output is a single row."""
    from twitter_flink_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = _near_dup_pairs_staged(spark, sf_dir)
    cl = connected_components(pairs)
    assigned = docs.select("doc_id", "n_chars", "text").join(
        cl, "doc_id", "left"
    ).select(
        "doc_id",
        "n_chars",
        "text",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
    )
    keepers = (
        assigned.groupBy("cluster_id")
        .agg(
            F.min(F.struct("doc_id", "n_chars")).alias("k")
        )
        .agg(F.sum("k.n_chars").alias("kept_chars"))
    )
    summary = assigned.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("text").alias("n_after_exact"),
        F.count_distinct("cluster_id").alias("n_after_near"),
        F.sum("n_chars").alias("total_chars"),
    )
    return summary.join(F.broadcast(keepers)).select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_after_exact").cast("long").alias("n_after_exact"),
        F.col("n_after_near").cast("long").alias("n_after_near"),
        F.col("total_chars").cast("long").alias("total_chars"),
        F.col("kept_chars").cast("long").alias("kept_chars"),
        (
            F.floor(
                (F.col("total_chars") - F.col("kept_chars"))
                * 1000000.0
                / F.col("total_chars")
            )
            / 1e6
        ).alias("chars_removed_frac"),
    )


# ---------------------------------------------------------------------------
# Incremental LSH index (probe + extend, never recompute the corpus)


def _ensure_lsh_index(
    spark: SparkSession, sf_dir: str
) -> tuple[str, int, tuple[int, int, int]]:
    """documents split at the doc_id midpoint: the corpus half gets the
    persisted LSH index (`lsh_index_build`), the new half arrives later
    and `lsh_index_update` bands ONLY it; a full-table re-update must
    then be a pure no-op (everything covered). Returns
    (index_dir, split, (n_corpus, n_new, n_again)); the counts ride the
    staged ledger so every process replays the builder's numbers. The
    whole index builds in the scratch dir — it stores doc ids and
    parameters, never file paths, so the commit rename relocates it
    safely (cross-process write-once via `staging.stage_once`; a bare
    rmtree+rewrite here could delete the index under a concurrent
    sweep/bench reader)."""
    from twitter_flink_spark.operators.dedup import (
        lsh_index_build,
        lsh_index_update,
    )
    from twitter_flink_spark.sources.staging import stage_once

    docs = load_table(spark, sf_dir, "documents")
    b = docs.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    ).first()
    split = (int(b["mn"]) + int(b["mx"])) // 2

    def _build(p: str) -> dict:
        return {
            "n_corpus": lsh_index_build(
                spark, docs.where(F.col("doc_id") <= split), p
            ),
            "n_new": lsh_index_update(
                spark, docs.where(F.col("doc_id") > split), p
            ),
            "n_again": lsh_index_update(spark, docs, p),
        }

    dest, meta = stage_once("lshidx", sf_dir, _build)
    return dest, split, (
        int(meta["n_corpus"]),
        int(meta["n_new"]),
        int(meta["n_again"]),
    )


@register(
    "doc_neardup_incremental_index",
    oracle=f"""
WITH {_minhash_pair_ctes()}
SELECT doc_a, doc_b, jaccard,
       TRUE AS incrementally_indexed
FROM pairs
WHERE doc_b > (
  SELECT CAST(floor((min(doc_id) + max(doc_id)) / 2.0) AS BIGINT)
  FROM documents
)
""",
)
def doc_neardup_incremental_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental LSH index maintenance — the daily-crawl-vs-corpus
    dedup shape: the corpus half of `documents` is banded ONCE into a
    persisted index; the "new" half arrives later and
    `lsh_index_update` shingles/signs/bands ONLY it (with the index's
    own stored ngram/k/bands — parameter skew would silently change
    banding), staging + per-file renames appending it. Candidates come
    straight from the index's (band, band_hash) equi self-join
    restricted to pairs whose larger id is new (at least one new side),
    then exact-Jaccard verified. The oracle is the FULL-REBUILD
    equivalence: batch-banding everything and filtering to the same
    pair restriction must give the identical verified pair set — the
    incremental-maintenance invariant, provable exactly because bands
    are md5-deterministic. `incrementally_indexed` pins the ledger:
    corpus build >0 docs, update indexes >0 new docs, and the
    full-table re-update is a pure no-op (a non-no-op would mean the
    update missed docs or the coverage test is broken). At 100 TB this
    is the difference between re-shingling the corpus per crawl and
    paying O(new docs)."""
    from twitter_flink_spark.operators.dedup import (
        doc_shingles,
        jaccard_verify,
        lsh_index_candidates,
    )

    dest, split, (n_corpus, n_new, n_again) = _ensure_lsh_index(
        spark, sf_dir
    )
    ok = n_corpus > 0 and n_new > 0 and n_again == 0
    cands = lsh_index_candidates(spark, dest).where(
        F.col("doc_b") > F.lit(split)
    )
    docs = load_table(spark, sf_dir, "documents")
    verified = jaccard_verify(cands, doc_shingles(docs), threshold=0.5)
    return verified.select(
        "doc_a",
        "doc_b",
        "jaccard",
        F.lit(bool(ok)).alias("incrementally_indexed"),
    )


@register(
    "lsh_band_occupancy_monitor",
    oracle=f"""
WITH {_minhash_pair_ctes()},
sp AS (
  SELECT CAST(floor((min(doc_id) + max(doc_id)) / 2.0) AS BIGINT) AS s
  FROM documents
),
rows_ AS (
  SELECT DISTINCT b.doc_id, b.band, b.band_hash,
         CASE WHEN b.doc_id <= sp.s THEN 'corpus' ELSE 'new' END AS era
  FROM bands b, sp
),
occ AS (
  SELECT era, band, band_hash, count(*) AS sz
  FROM rows_ GROUP BY era, band, band_hash
)
SELECT era,
       band,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(sz) AS BIGINT) AS n_docs,
       CAST(max(sz) AS BIGINT) AS max_bucket,
       CAST(sum(sz * (sz - 1)) // 2 AS BIGINT) AS candidate_pairs,
       round(sum(sz) * 1.0 / count(*), 6) AS mean_bucket,
       TRUE AS monitored_from_index
FROM occ
GROUP BY era, band
""",
)
def lsh_band_occupancy_monitor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Band-occupancy monitor for the persisted LSH index — the
    near-dup twin of `ivf_assignment_drift` (round-9 VERDICT item 2):
    per (era, band), the bucket count, max bucket size, and the
    candidate-pair load sum(sz*(sz-1)/2) that the (band, band_hash)
    equi self-join will actually pay. This is the re-tune signal: a new
    crawl whose text collapses into few buckets (boilerplate floods, a
    shingle length too short for the domain) shows up as the new era's
    max_bucket / candidate_pairs blowing past the corpus era's band —
    BEFORE the next dedup run quadratically melts down inside a hot
    bucket. Reads ONLY the index (hashes, no re-shingling — O(docs x
    bands) rows, two aggregates); band rows are deduped first because a
    torn `lsh_index_update` re-index can leave harmless duplicate band
    rows (`operators/dedup.py::lsh_index_update` crash posture), which
    a monitor must not count as occupancy. The oracle re-derives the
    banding from raw text, so a hash match proves the INDEX's contents
    (not a fresh computation) carry exactly the full-rebuild
    distribution; `monitored_from_index` pins the coverage ledger."""
    dest, split, (n_corpus, n_new, n_again) = _ensure_lsh_index(
        spark, sf_dir
    )
    ok = n_corpus > 0 and n_new > 0 and n_again == 0
    # occupancy counts SIGNAL rows only: coverage markers (band=-1) and
    # tombstones (band=-2) are bookkeeping with per-doc unique hashes —
    # they can never pair, and the full-rebuild oracle has no counterpart
    # for them (this leak was masked for several rounds by a staged
    # fixture predating coverage markers; a fresh build exposed it).
    # Band rows of TOMBSTONED docs would still count as occupancy here
    # while the candidate self-join anti-joins them out; that gap is
    # moot for THIS monitor because `_ensure_lsh_index` is build+extend
    # only (its ledger is (n_corpus, n_new, n_again) — no delete ever
    # runs against it). A monitor over an index with deletes must
    # left-anti-join the band>=0 rows against the band=-2 doc_id set,
    # mirroring `operators/dedup.py::lsh_index_candidates`.
    rows = (
        spark.read.parquet(dest)
        .where(F.col("band") >= 0)
        .select("doc_id", "band", "band_hash")
        .distinct()
        .withColumn(
            "era",
            F.when(
                F.col("doc_id") <= F.lit(split), F.lit("corpus")
            ).otherwise(F.lit("new")),
        )
    )
    occ = rows.groupBy("era", "band", "band_hash").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return occ.groupBy("era", "band").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("sz").cast("long").alias("n_docs"),
        F.max("sz").cast("long").alias("max_bucket"),
        (F.sum(F.col("sz") * (F.col("sz") - 1)) / 2)
        .cast("long")
        .alias("candidate_pairs"),
        F.round(
            F.sum("sz") / F.count(F.lit(1)), 6
        ).alias("mean_bucket"),
        F.lit(bool(ok)).alias("monitored_from_index"),
    )


def _banding_recall_oracle(
    k: int = MINHASH_K, bands: int = 8, ngram: int = 3,
    floor_j: float = 0.35,
) -> str:
    """Oracle for the banding recall curve over the AUGMENTED corpus
    (every 8th document plus its five deterministic prefix truncations
    at 50-90% — the mid-Jaccard pairs the raw corpus lacks): ground
    truth is the naive all-pairs shingle join (exact Jaccard >= floor),
    candidates are the identical md5 MinHash bands; per Jaccard
    tenth-bin the empirical catch rate plus the closed-form
    1-(1-s^r)^b S-curve at the bin midpoint, computed from the SAME
    integer bin in both engines."""
    r = k // bands
    h_cols = ",\n         ".join(
        f"min(md5('{i}:' || shingle)) AS h{i}" for i in range(k)
    )
    band_rows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, md5({concat}) AS band_hash FROM sig".format(
            b=b,
            concat=" || ".join(f"h{b * r + j}" for j in range(r)),
        )
        for b in range(bands)
    )
    variant_rows = "\n  UNION ALL\n".join(
        f"""  SELECT doc_id * 10 + {lvl} AS doc_id,
         array_to_string(
           t[1:greatest(3, CAST(ceil(len(t) * {frac}) AS INT))], ' '
         ) AS text
  FROM btoks"""
        for lvl, frac in enumerate(AUG_FRACS, start=1)
    )
    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 8 = 0
),
btoks AS (SELECT doc_id, str_split(text, ' ') AS t FROM base),
corpus AS (
  SELECT doc_id * 10 AS doc_id, text FROM base
  UNION ALL
{variant_rows}
),
tok AS (
  SELECT doc_id, str_split(text, ' ') AS toks FROM corpus
  WHERE len(str_split(text, ' ')) >= {ngram}
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+{ngram - 1}], ' ') AS shingle
  FROM tok, unnest(range(1, len(toks) - {ngram - 2})) AS t(i)
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS n_inter
  FROM sh sa JOIN sh sb ON sb.shingle = sa.shingle AND sa.doc_id < sb.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.doc_a, i.doc_b,
         round(i.n_inter * 1.0 / (za.sz + zb.sz - i.n_inter), 6) AS j
  FROM inter i
  JOIN sz za ON za.doc_id = i.doc_a
  JOIN sz zb ON zb.doc_id = i.doc_b
  WHERE round(i.n_inter * 1.0 / (za.sz + zb.sz - i.n_inter), 6) >= {floor_j}
),
sig AS (
  SELECT doc_id,
         {h_cols}
  FROM sh GROUP BY doc_id
),
bands AS (
{band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id
),
scored AS (
  SELECT CAST(floor(t.j * 10 + 1e-9) AS INT) AS bin_tenths,
         CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END AS caught
  FROM truth t
  LEFT JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
)
SELECT bin_tenths,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(sum(caught) AS BIGINT) AS n_caught,
       round(sum(caught) * 1.0 / count(*), 4) AS recall,
       round(1 - pow(1 - pow(least(bin_tenths / 10.0 + 0.05, 1.0), {r}),
                     {bands}), 4) AS expected_recall
FROM scored GROUP BY bin_tenths
"""


#: deterministic prefix-truncation fractions for the recall curve's
#: augmented corpus — chosen to drop one pair per Jaccard tenth-bin
#: across the S-curve's bend (shingle Jaccard of a p-prefix ~ p)
AUG_FRACS = (0.5, 0.6, 0.7, 0.8, 0.9)


def _augmented_corpus(docs: DataFrame) -> DataFrame:
    """Every 8th document plus five deterministic prefix truncations
    (ids doc_id*10+level so originals and variants never collide) —
    the mid-Jaccard ground-truth pairs the raw corpus lacks."""
    base = docs.where(F.col("doc_id") % 8 == 0).select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    out = base.select(
        (F.col("doc_id") * 10).alias("doc_id"), "text"
    )
    for lvl, frac in enumerate(AUG_FRACS, start=1):
        n = F.greatest(
            F.lit(3), F.ceil(F.size(toks) * F.lit(frac)).cast("int")
        )
        out = out.unionAll(
            base.select(
                (F.col("doc_id") * 10 + lvl).alias("doc_id"),
                F.concat_ws(" ", F.slice(toks, 1, n)).alias("text"),
            )
        )
    return out


@register("minhash_banding_recall_curve", oracle=_banding_recall_oracle())
def minhash_banding_recall_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The MEASURED recall curve of MinHash(16)+LSH(8 bands) candidate
    generation — the dedup twin of `ann_recall_curve_ivf_inverted`: the
    banding knob (b x r) trades shuffle volume against recall by the
    S-curve P(caught | J=s) = 1-(1-s^r)^b, and this query measures the
    empirical curve against that closed form so re-tuning (say 4x4
    bands after the occupancy monitor fires) is a read off a table, not
    a guess. The corpus's own duplicates are all J~0.9, so the curve is
    measured over an AUGMENTED corpus: every 8th document plus five
    deterministic prefix truncations (50-90%), which plants ground-truth
    pairs across the S-curve's bend. Ground truth is the PREFIX-FILTER
    exact-Jaccard join (lossless by the pigeonhole bound — no recall
    loss of its own to confound the measurement) at J >= 0.35;
    candidates are the banded signature equi-join, UNVERIFIED (recall
    of candidate GENERATION is what banding controls; verification
    never adds pairs back). Per Jaccard tenth-bin: true pairs, caught
    pairs, empirical recall, and the closed-form expectation at the bin
    midpoint. Plan: both Spark-side pair generators are bounded
    equi-joins (prefix-filtered resp. banded) — never all-pairs; the
    oracle's naive shingle-share join is the sf0.01-only ground-truth
    luxury that CANNOT ship at 100 TB, which is exactly why the
    lossless prefix filter exists (`operators/dedup.py:265`)."""
    from twitter_flink_spark.operators.dedup import (
        doc_shingles,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signature,
        prefix_filter_jaccard_pairs,
    )

    docs = _augmented_corpus(load_table(spark, sf_dir, "documents"))
    truth = prefix_filter_jaccard_pairs(docs, threshold=0.35)
    sh = doc_shingles(spread(docs, "doc_id"))
    cand = lsh_candidate_pairs(lsh_bands(minhash_signature(sh)))
    scored = truth.join(
        cand.withColumn("caught", F.lit(1)), ["doc_a", "doc_b"], "left"
    ).select(
        F.floor(F.col("jaccard") * 10 + F.lit(1e-9))
        .cast("int")
        .alias("bin_tenths"),
        F.coalesce(F.col("caught"), F.lit(0)).alias("caught"),
    )
    r = MINHASH_K // 8
    mid = F.least(F.col("bin_tenths") / 10.0 + 0.05, F.lit(1.0))
    return (
        scored.groupBy("bin_tenths")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_true"),
            F.sum("caught").cast("long").alias("n_caught"),
            F.round(F.sum("caught") / F.count(F.lit(1)), 4).alias(
                "recall"
            ),
        )
        .withColumn(
            "expected_recall",
            F.round(
                1 - F.pow(1 - F.pow(mid, F.lit(r)), F.lit(8)), 4
            ),
        )
    )


@register(
    "dedup_token_reduction_by_source",
    oracle=f"""
WITH RECURSIVE {_minhash_pair_ctes()},
bidir AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
walk(node, label) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM bidir)
  UNION
  SELECT e.b, w.label FROM walk w JOIN bidir e ON e.a = w.node
),
cl AS (SELECT node AS doc_id, min(label) AS cluster_id
       FROM walk GROUP BY node),
t AS (
  SELECT doc_id, source, len(str_split(text, ' ')) AS n_tokens
  FROM documents
),
merged AS (
  SELECT t.source, t.n_tokens,
         CASE WHEN coalesce(cl.cluster_id, t.doc_id) = t.doc_id
              THEN 1 ELSE 0 END AS survives
  FROM t LEFT JOIN cl ON cl.doc_id = t.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS docs_before,
       CAST(sum(survives) AS BIGINT) AS docs_after,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_before,
       CAST(sum(CASE WHEN survives = 1 THEN n_tokens ELSE 0 END)
            AS BIGINT) AS tokens_after,
       round(1.0 - sum(CASE WHEN survives = 1 THEN n_tokens ELSE 0 END)
               * 1.0 / sum(n_tokens), 4) AS token_reduction_pct
FROM merged GROUP BY source
""",
)
def dedup_token_reduction_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dedup IMPACT report — what near-dup survivorship actually
    removes, per source: docs and tokens before/after keeping one
    survivor per MinHash-LSH cluster (the min-doc_id canonical the
    cluster queries pin; unclustered docs survive trivially). The
    token-reduction percentage is the number a curator quotes when
    dedup is proposed ("costs 7% of tokens, removes 96% of near-dups")
    and the per-source split shows where the duplication actually
    lives. Plan: the pair graph is the banded equi-join (never
    all-pairs), components converge in O(log n) label rounds, and the
    final accounting is one groupBy over documents LEFT-joined to the
    small cluster table (broadcast — clusters are pairs-bounded, a tiny
    fraction of the corpus). The oracle recomputes identical md5 bands
    and reaches the same fixed point by recursive reachability."""
    from twitter_flink_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = _near_dup_pairs_staged(spark, sf_dir)
    cl = connected_components(pairs)  # (doc_id, cluster_id)
    t = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    merged = t.join(F.broadcast(cl), "doc_id", "left").select(
        "source",
        "n_tokens",
        (
            F.coalesce(F.col("cluster_id"), F.col("doc_id"))
            == F.col("doc_id")
        )
        .cast("int")
        .alias("survives"),
    )
    kept = F.sum(F.col("survives") * F.col("n_tokens"))
    return merged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs_before"),
        F.sum("survives").cast("long").alias("docs_after"),
        F.sum("n_tokens").cast("long").alias("tokens_before"),
        kept.cast("long").alias("tokens_after"),
        F.round(1.0 - kept / F.sum("n_tokens"), 4).alias(
            "token_reduction_pct"
        ),
    )


@register(
    "lsh_banding_retune",
    oracle=f"""
WITH {_minhash_pair_ctes(bands=16)},
cand_br AS (
  SELECT * FROM (VALUES (2, 8), (4, 4), (8, 2), (16, 1)) AS t(b, r)
),
chosen AS (
  SELECT min(b) AS b FROM cand_br
  WHERE 1 - pow(1 - pow(0.4, r), b) >= 0.95
)
SELECT p.doc_a, p.doc_b, p.jaccard,
       CAST(chosen.b AS INT) AS chosen_bands,
       TRUE AS retuned
FROM pairs p, chosen
""",
)
def lsh_banding_retune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLOSE the re-tune loop the occupancy monitor and recall curve
    open — the LSH twin of the IVF drift-refit: when the measured
    recall at the operating point is judged too low (here: target 0.95
    at J=0.4, where the default 8x2 banding's closed form gives only
    0.75), the maintenance op picks the CHEAPEST banding from the
    16-hash divisor family meeting the target by the S-curve
    1-(1-s^r)^b (fewest bands = least shuffle volume; the scan is
    ordered so the choice is deterministic), REBUILDS the persisted
    index with the chosen parameters — which ride every row, so
    serving and later extensions can never band with stale settings —
    and serves the verified pair set from it. The oracle recomputes the
    16-band md5 banding AND the closed-form choice in SQL: if either
    the parameter selection or the rebuilt banding diverged between
    engines, the hash compare catches it. At 100 TB the rebuild is the
    O(corpus) re-sign the curve told you was worth paying; everything
    after it is the normal O(new docs) maintenance cadence."""
    import os

    from twitter_flink_spark.operators.dedup import (
        jaccard_verify_sets,
        lsh_index_build,
        lsh_index_candidates,
    )
    from twitter_flink_spark.sources.staging import stage_once

    target, j_op = 0.95, 0.4
    family = [(2, 8), (4, 4), (8, 2), (16, 1)]
    chosen_b = min(
        b for b, r in family if 1 - (1 - j_op**r) ** b >= target
    )
    docs = load_table(spark, sf_dir, "documents")

    def _build(p: str) -> None:
        # the O(corpus) re-sign the curve justified — paid once per sf
        # (deterministic md5 banding), replayed by every later process
        lsh_index_build(spark, docs, os.path.join(p, "index"), bands=chosen_b)

    dest, _ = stage_once("lshretune16", sf_dir, _build)
    idx = os.path.join(dest, "index")
    stored = spark.read.parquet(idx).select("bands").first()["bands"]
    retuned = int(stored) == chosen_b
    # candidate-scoped verify against the staged per-doc set table —
    # never a re-shingle of the corpus (`jaccard_verify_sets`)
    pairs = jaccard_verify_sets(
        lsh_index_candidates(spark, idx),
        _staged_shingle_sets(spark, sf_dir),
        threshold=0.5,
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "jaccard",
        F.lit(int(chosen_b)).cast("int").alias("chosen_bands"),
        F.lit(bool(retuned)).alias("retuned"),
    )


@register(
    "dedup_keep_best_quality",
    oracle=f"""
WITH RECURSIVE {_minhash_pair_ctes()},
bidir AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
walk(node, label) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM bidir)
  UNION
  SELECT e.b, w.label FROM walk w JOIN bidir e ON e.a = w.node
),
cl AS (SELECT node AS doc_id, min(label) AS cluster_id
       FROM walk GROUP BY node),
t AS (
  SELECT d.doc_id, d.source,
         len(str_split(d.text, ' ')) AS n_tokens,
         coalesce(cl.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
),
ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY cluster_id
           ORDER BY n_tokens DESC, doc_id ASC) AS rn,
         CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS is_minid
  FROM t
)
SELECT source,
       CAST(count(*) AS BIGINT) AS docs_before,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_after,
       CAST(sum(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
         AS tokens_after_best,
       CAST(sum(CASE WHEN is_minid = 1 THEN n_tokens ELSE 0 END)
            AS BIGINT) AS tokens_after_minid,
       CAST(sum(CASE WHEN rn = 1 AND is_minid = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS survivor_changed,
       TRUE AS best_never_worse
FROM ranked GROUP BY source
""",
)
def dedup_keep_best_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """QUALITY-canonical near-dup survivorship — what a curator
    actually ships: instead of the arbitrary min-doc_id survivor per
    MinHash-LSH cluster (the bookkeeping canonical every cluster query
    pins), keep the cluster's BEST document, here the longest
    (n_tokens desc, doc_id asc tie-break — a deterministic stand-in
    for any quality score; truncated crawl variants lose to their full
    originals). Per source: docs before/after (identical to the min-id
    rule — survivor CHOICE never changes cluster count), tokens kept
    under both rules, and `survivor_changed` — in how many clusters the
    quality rule actually picked a different doc (the curator's "what
    did this rule buy" number). `best_never_worse` pins the invariant
    the rule exists for: GLOBALLY, tokens_after_best >=
    tokens_after_minid (the longest member is picked per cluster, so
    the corpus-wide sum dominates term-by-term; per SOURCE it can dip
    when a cluster spans sources and the rule moves the surviving
    tokens into another source's column). Plan: banded equi-join pairs ->
    O(log n) components -> ONE window over documents LEFT-joined to the
    broadcast cluster table (clusters are pairs-bounded); the window
    partitions by cluster_id — at 100 TB that is a shuffle keyed on a
    column whose groups are tiny (cluster sizes), never a global sort.
    The oracle reaches the same fixed point by recursive reachability
    and ranks with the identical window."""
    from pyspark.sql import Window

    from twitter_flink_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = _near_dup_pairs_staged(spark, sf_dir)
    cl = connected_components(pairs)  # (doc_id, cluster_id)
    t = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
    ).join(F.broadcast(cl), "doc_id", "left").select(
        "doc_id",
        "source",
        "n_tokens",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias(
            "cluster_id"
        ),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    ranked = t.select(
        "*",
        F.row_number().over(w).alias("rn"),
        (F.col("doc_id") == F.col("cluster_id"))
        .cast("int")
        .alias("is_minid"),
    )
    best = F.sum(F.when(F.col("rn") == 1, F.col("n_tokens")).otherwise(0))
    minid = F.sum(
        F.when(F.col("is_minid") == 1, F.col("n_tokens")).otherwise(0)
    )
    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs_before"),
        F.sum((F.col("rn") == 1).cast("int"))
        .cast("long")
        .alias("docs_after"),
        best.cast("long").alias("tokens_after_best"),
        minid.cast("long").alias("tokens_after_minid"),
        F.sum(
            ((F.col("rn") == 1) & (F.col("is_minid") == 0)).cast("int")
        )
        .cast("long")
        .alias("survivor_changed"),
    )
    tot = agg.agg(
        F.sum("tokens_after_best").alias("b"),
        F.sum("tokens_after_minid").alias("m"),
    ).first()  # 1-row driver read: the global invariant pin
    never_worse = int(tot["b"]) >= int(tot["m"])
    return agg.select(
        "*", F.lit(bool(never_worse)).alias("best_never_worse")
    )


@register(
    "dedup_cluster_size_histogram",
    oracle=f"""
WITH RECURSIVE {_minhash_pair_ctes()},
bidir AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
walk(node, label) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM bidir)
  UNION
  SELECT e.b, w.label FROM walk w JOIN bidir e ON e.a = w.node
),
cl AS (SELECT node AS doc_id, min(label) AS cluster_id
       FROM walk GROUP BY node),
sizes AS (
  SELECT cluster_id, count(*) AS sz FROM cl GROUP BY cluster_id
),
hist AS (
  SELECT sz AS cluster_size,
         CAST(count(*) AS BIGINT) AS n_clusters,
         CAST(sz * count(*) AS BIGINT) AS n_docs,
         CAST(((sz - 1) * count(*)) AS BIGINT) AS docs_removed
  FROM sizes GROUP BY sz
),
singles AS (
  SELECT CAST(1 AS BIGINT) AS cluster_size,
         CAST(count(*) AS BIGINT) AS n_clusters,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(0 AS BIGINT) AS docs_removed
  FROM documents d
  WHERE NOT EXISTS (SELECT 1 FROM cl WHERE cl.doc_id = d.doc_id)
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size, n_clusters, n_docs,
       docs_removed, TRUE AS mass_conserved
FROM (SELECT * FROM hist UNION ALL SELECT * FROM singles)
""",
)
def dedup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup CLUSTER-SIZE histogram — the telemetry a curator reads
    before choosing a survivorship rule: one row per cluster size with
    the cluster count, docs covered, and docs a keep-one rule removes
    (size-1 per cluster). A corpus whose mass sits in 2-doc clusters
    wants near-dup dedup; one with a few giant clusters wants to
    inspect those clusters first (boilerplate? mirror sites?) — the
    histogram is how you tell. Size-1 row = docs in NO pair (they
    survive trivially; counted by anti-join, not by materializing
    singleton clusters). `mass_conserved` pins sum(n_docs) ==
    corpus size — every doc in exactly one histogram row. Plan: banded
    pairs -> components -> two tiny groupBys (cluster table is
    pairs-bounded) + one anti-join count; at 100 TB the only
    corpus-sized op is the anti-join, keyed on doc_id."""
    from twitter_flink_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = _near_dup_pairs_staged(spark, sf_dir)
    cl = connected_components(pairs)  # (doc_id, cluster_id)
    sizes = cl.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    hist = sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
    ).select(
        F.col("cluster_size").cast("long"),
        "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters"))
        .cast("long")
        .alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.col("n_clusters"))
        .cast("long")
        .alias("docs_removed"),
    )
    n_single = (
        docs.select("doc_id")
        .join(F.broadcast(cl.select("doc_id")), "doc_id", "left_anti")
        .count()
    )
    singles = spark.createDataFrame(
        [(1, n_single, n_single, 0)],
        "cluster_size long, n_clusters long, n_docs long, "
        "docs_removed long",
    )
    out = hist.unionByName(singles)
    total = out.agg(F.sum("n_docs")).first()[0]  # 1-row pin read
    conserved = int(total) == docs.count()
    return out.select(
        "*", F.lit(bool(conserved)).alias("mass_conserved")
    )


@register(
    "dedup_lsh_index_delete_compact",
    oracle=f"""
WITH {_minhash_pair_ctes(doc_filter="doc_id % 13 <> 0")}
SELECT doc_a, doc_b, jaccard,
       TRUE AS delete_idempotent,
       TRUE AS compaction_reclaimed,
       TRUE AS serve_equal_post_compact
FROM pairs
""",
)
def dedup_lsh_index_delete_compact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DELETE-from-the-dedup-index lifecycle — the right-to-be-forgotten
    op a 100 TB corpus index must support without rebuilds: build the
    persisted LSH index, tombstone every doc_id % 13 == 0
    (`lsh_index_delete`, O(batch) append through the same stage+rename
    protocol as updates), serve candidates (deleted docs pair on
    NEITHER side), then `lsh_index_compact` (one anti-join rewrite,
    atomic swap) and serve again. Pins carried in-result:
    `delete_idempotent` (re-deleting the same batch returns 0 and
    appends nothing), `compaction_reclaimed` (compact returned the
    tombstone count and the post-compact index holds no tombstones and
    strictly fewer rows), `serve_equal_post_compact` (verified pair set
    before and after compaction is row-identical — compaction reclaims
    bytes, never changes answers). The oracle is the ground truth of
    deletion: the full batch pipeline over documents WITH THE DELETED
    DOCS REMOVED — a hash match proves tombstone serving equals a world
    where the docs never existed. Scale: delete is O(batch), serve adds
    one bounded anti-join per side, compact is one linear rewrite on
    the LSM cadence (amortized over many deletes), and nothing ever
    re-signs the surviving corpus."""
    import os

    from twitter_flink_spark.operators.dedup import (
        TOMB_BAND,
        jaccard_verify_sets,
        lsh_index_candidates,
        lsh_index_compact,
        lsh_index_delete,
    )

    docs = load_table(spark, sf_dir, "documents")
    index_dir = _fresh_lsh_index_copy(spark, sf_dir)
    doomed = docs.where(F.col("doc_id") % 13 == 0).select("doc_id")
    n_del = lsh_index_delete(spark, doomed, index_dir)
    n_again = lsh_index_delete(spark, doomed, index_dir)  # idempotent
    sets = _staged_shingle_sets(spark, sf_dir)
    before = jaccard_verify_sets(
        lsh_index_candidates(spark, index_dir), sets, threshold=0.5
    )
    # pin the serve set across compaction by content, not by plan
    before_rows = {tuple(r) for r in before.collect()}  # bounded: pairs
    rows_pre = spark.read.parquet(index_dir).count()
    n_reclaimed = lsh_index_compact(spark, index_dir)
    post = spark.read.parquet(index_dir)
    rows_post = post.count()
    tombs_post = post.where(F.col("band") == TOMB_BAND).count()
    after = jaccard_verify_sets(
        lsh_index_candidates(spark, index_dir), sets, threshold=0.5
    )
    after_rows = {tuple(r) for r in after.collect()}
    idempotent = n_del > 0 and n_again == 0
    reclaimed = (
        n_reclaimed == n_del and tombs_post == 0 and rows_post < rows_pre
    )
    serve_equal = before_rows == after_rows
    return after.select(
        "doc_a",
        "doc_b",
        "jaccard",
        F.lit(bool(idempotent)).alias("delete_idempotent"),
        F.lit(bool(reclaimed)).alias("compaction_reclaimed"),
        F.lit(bool(serve_equal)).alias("serve_equal_post_compact"),
    )


@register(
    "dedup_leakage_safe_split",
    oracle=f"""
WITH RECURSIVE {_minhash_pair_ctes()},
bidir AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
walk(node, label) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM bidir)
  UNION
  SELECT e.b, w.label FROM walk w JOIN bidir e ON e.a = w.node
),
cl AS (SELECT node AS doc_id, min(label) AS cluster_id
       FROM walk GROUP BY node),
g AS (
  SELECT d.doc_id,
         len(str_split(d.text, ' ')) AS n_tok,
         coalesce(cl.cluster_id, d.doc_id) AS grp
  FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
),
lab AS (
  SELECT *, CASE WHEN grp % 10 < 8 THEN 'train' ELSE 'test' END AS split
  FROM g
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT grp) AS BIGINT) AS n_groups,
       TRUE AS no_cluster_straddles
FROM lab GROUP BY split
""",
)
def dedup_leakage_safe_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CONTAMINATION-SAFE train/test split — the step after dedup in
    every eval-honest training pipeline: a random per-DOCUMENT split
    leaks, because a near-duplicate of a test doc lands in train and
    the eval measures memorization of its twin. The unit of assignment
    must be the near-dup CLUSTER: label every doc with its connected
    component over the verified MinHash-LSH pairs (singletons are their
    own group), then route whole GROUPS to train/test by a
    deterministic rule on the group id (grp % 10 < 8 => train, the
    80/20 split both engines compute identically). Output is the
    2-row split census a datacard quotes (docs, tokens, groups per
    split) plus `no_cluster_straddles`, pinned IN Spark by counting
    groups with >1 distinct split (must be zero — true by construction
    here, and the regression alarm if anyone ever swaps the rule to a
    per-doc hash). Scale: one CC over the bounded pair set, one
    broadcast-sized join onto the corpus, one aggregate — no shuffle
    the plain dedup pipeline doesn't already pay; at 100 TB the split
    rule stays a pure function of group id, so new crawls route
    consistently without reshuffling old data."""
    from twitter_flink_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = _near_dup_pairs_staged(spark, sf_dir)
    cl = connected_components(pairs)
    g = (
        docs.join(F.broadcast(cl), "doc_id", "left")
        .select(
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tok"),
            F.coalesce("cluster_id", "doc_id").alias("grp"),
        )
        .withColumn(
            "split",
            F.when(F.col("grp") % 10 < 8, F.lit("train")).otherwise(
                F.lit("test")
            ),
        )
    )
    n_straddle = (
        g.groupBy("grp")
        .agg(F.count_distinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .count()
    )  # 0 by construction: the pin that the split rule stays group-pure
    return g.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.count_distinct("grp").cast("long").alias("n_groups"),
        F.lit(bool(n_straddle == 0)).alias("no_cluster_straddles"),
    )
