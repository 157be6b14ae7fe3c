"""Ad-hoc r16 measurement probes: sub-pipeline timings + row counts for
the round's target queries (multiprobe candidate stages, profile census,
maintenance phase walls). Read-only diagnostics — never part of bench.

Usage: python scripts/probe_r16.py <probe> [sf_dir]
Probes: multiprobe | profile | simhash
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from twitter_flink_spark.session import get_spark  # noqa: E402


def _noop(df, label):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {label}: {time.perf_counter() - t0:.3f}s", flush=True)


def _count(df, label):
    t0 = time.perf_counter()
    n = df.count()
    print(
        f"  {label}: n={n} ({time.perf_counter() - t0:.3f}s)", flush=True
    )
    return n


def multiprobe(spark, sf_dir):
    from twitter_flink_spark.operators.similarity import (
        multiprobe_band_probes,
    )
    from twitter_flink_spark.queries.similarity import (
        _DOC_LSH_BANDS,
        _DOC_LSH_PLANES,
        _ensure_doc_lsh_profile,
    )

    prof = spark.read.parquet(
        _ensure_doc_lsh_profile(spark, sf_dir)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _count(prof, "profile docs")
    banded = prof.select(
        "doc_id", F.posexplode("sigs").alias("band", "band_sig")
    )
    r = _DOC_LSH_PLANES // _DOC_LSH_BANDS
    probes = multiprobe_band_probes(banded, r, id_col="doc_id").select(
        F.col("doc_id").alias("p_id"), "band", "band_sig"
    )
    index = banded.select(
        F.col("doc_id").alias("i_id"), "band", "band_sig"
    )
    joined = probes.join(index, on=["band", "band_sig"]).where(
        F.col("p_id") != F.col("i_id")
    )
    cands = joined.select(
        F.least("p_id", "i_id").alias("doc_a"),
        F.greatest("p_id", "i_id").alias("doc_b"),
    ).distinct()
    _count(joined, "pre-distinct candidate rows")
    _count(cands, "distinct candidate pairs")
    _noop(cands, "cands noop")
    # map sizes
    stats = prof.select(
        F.size(F.map_keys("m")).alias("terms")
    ).agg(F.avg("terms"), F.max("terms"), F.expr("percentile(terms, 0.5)"))
    print("  term stats:", stats.collect(), flush=True)


def profile(spark, sf_dir):
    from twitter_flink_spark.queries.scale import profile_columns_lineitem
    from twitter_flink_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    _count(li, "lineitem rows")
    _noop(li.select("l_quantity", "l_extendedprice", "l_returnflag",
                    "l_linestatus", "l_shipdate"), "scan 5 cols")
    one = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("l_quantity").alias("d1"),
    )
    _noop(one, "agg 1 distinct")
    full = profile_columns_lineitem(spark, sf_dir)
    _noop(full, "full census (1st)")
    _noop(full, "full census (2nd)")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        full.explain(mode="formatted")
    print(buf.getvalue()[:4000])


def simhash(spark, sf_dir):
    from twitter_flink_spark.operators.dedup import simhash16
    from twitter_flink_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sig = simhash16(docs).persist(StorageLevel.MEMORY_AND_DISK)
    _count(sig, "signatures")
    import itertools

    bands = None
    for i, (b1, b2) in enumerate(itertools.combinations(range(4), 2)):
        part = sig.select(
            "doc_id",
            F.lit(i).alias("band"),
            F.concat(
                F.substring("simhash", b1 * 4 + 1, 4),
                F.substring("simhash", b2 * 4 + 1, 4),
            ).alias("band_bits"),
        )
        bands = part if bands is None else bands.unionByName(part)
    joined = (
        bands.alias("a")
        .join(bands.alias("b"), on=["band", "band_bits"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
    )
    _count(joined, "pre-distinct candidate rows")
    cand = joined.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
    ).distinct()
    _count(cand, "distinct candidate pairs")


def main() -> int:
    which = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="tfs-probe")
    t0 = time.perf_counter()
    globals()[which](spark, sf_dir)
    print(f"total {time.perf_counter() - t0:.3f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
