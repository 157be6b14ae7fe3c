"""Round-5 second-stretch operators vs pure-Python references — the same
pinning discipline as test_round5_ops: the DuckDB oracle certifies
cross-engine agreement; these tests certify the ALGORITHM against an
independent sequential implementation on small controlled inputs."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import date, timedelta

SF_DIR = "/root/testdata/sf0.001"


# --- EWMA: dyadic closed form vs the literal recursion ----------------------


def test_ewma_matches_recursive_reference(spark):
    """The shifted-integer closed form must equal the textbook recursion
    s_t = (c_t + s_{t-1})/2 run day by day (exact in floats because every
    intermediate is dyadic)."""
    from twitter_flink_spark.queries.temporal import ewma_daily_counts
    from twitter_flink_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    ev = load_table(spark, SF_DIR, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r.c))
    expected = {}
    for et, pts in series.items():
        s = None
        for _, c in sorted(pts):
            s = c if s is None else (c + s) / 2
        expected[et] = s
    got = {
        r.event_type: r.ewma
        for r in ewma_daily_counts(spark, SF_DIR).collect()
    }
    assert got == expected


# --- RBO closed-form tail weights vs the direct definition ------------------


def test_rbo_tail_weights_match_direct_formula():
    """sum over common items of C(max(ra, rb)) must equal the textbook
    truncated RBO sum (1-p) p^(d-1) |A_d ∩ B_d| / d for arbitrary
    depth-5 lists."""
    from decimal import Decimal
    from itertools import permutations

    from twitter_flink_spark.queries.similarity import (
        _RBO_K,
        _rbo_tail_weights,
    )

    cw = {m: Decimal(v) for m, v in _rbo_tail_weights().items()}
    p = Decimal("0.9")
    a_items = list("abcde")
    for b_items in (
        list("abcde"),
        list("edcba"),
        list("abxyz"),
        list("vwxyz"),
        ["a", "x", "b", "y", "c"],
    ):
        ra = {x: i + 1 for i, x in enumerate(a_items)}
        rb = {x: i + 1 for i, x in enumerate(b_items)}
        common = set(ra) & set(rb)
        via_tails = sum(cw[max(ra[x], rb[x])] for x in common)
        direct = Decimal(0)
        for d in range(1, _RBO_K + 1):
            overlap = len(
                {x for x in common if ra[x] <= d and rb[x] <= d}
            )
            direct += (1 - p) * p ** (d - 1) * overlap / d
        assert abs(via_tails - direct) < Decimal("1e-9"), (
            b_items,
            via_tails,
            direct,
        )


# --- Gopher rules on controlled documents -----------------------------------


def test_gopher_rules_on_synthetic_docs(spark):
    """Hand-checkable rule outcomes: a healthy doc passes, a too-short
    doc fails wordcount, a stopword-free doc fails the stopword rule, a
    one-token-dominated doc fails repetition."""
    from twitter_flink_spark.queries.textops import _gopher_doc_verdicts

    healthy = "the quick brown fox jumps over a lazy dog again " * 4
    short = "the a tiny doc"
    nostop = "alpha beta gamma delta epsilon zeta eta theta " * 5
    repeated = "the spam " + "spam " * 48 + "a end"
    rows = [
        (1, healthy.strip(), "s", "en"),
        (2, short, "s", "en"),
        (3, nostop.strip(), "s", "en"),
        (4, repeated.strip(), "s", "en"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string"
    )
    v = {
        r.doc_id: r
        for r in _gopher_doc_verdicts(docs).collect()
    }
    assert v[1].passes
    assert not v[2].r_wordcount and not v[2].passes
    assert not v[3].r_stopwords and not v[3].passes
    assert not v[4].r_repetition and not v[4].passes


# --- CUSUM daily partitioning: per-cell walk reference ----------------------


def test_cusum_daily_matches_python_walk(spark):
    """Each (type, day) excursion must equal a sequential Python walk
    over that cell's quantized deviations in (ts, event_id) order."""
    from twitter_flink_spark.queries.quality import cusum_daily_excursion
    from twitter_flink_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events").collect()
    q = [math.floor(r.value * 10000) for r in ev]
    mu = math.floor(sum(q) / len(q))
    cells = defaultdict(list)
    for r, qq in zip(ev, q):
        cells[(r.event_type, r.ts.date())].append((r.ts, r.event_id, qq))
    expected = {}
    for (et, day), rows in cells.items():
        s = 0
        mx = mn = None
        for _, _, qq in sorted(rows):
            s += qq - mu
            mx = s if mx is None else max(mx, s)
            mn = s if mn is None else min(mn, s)
        expected[(et, day.isoformat())] = mx - mn
    got = {
        (r.event_type, r.day): r.excursion4
        for r in cusum_daily_excursion(spark, SF_DIR).collect()
    }
    assert got == expected


# --- PresenceMV / GroupedCountMV: replay safety + merge correctness ---------


def _mk_batches(spark):
    rows1 = [(1, date(2024, 1, 1)), (1, date(2024, 1, 1)), (2, date(2024, 1, 2))]
    rows2 = [(1, date(2024, 1, 2)), (2, date(2024, 1, 2)), (3, date(2024, 1, 1))]
    b1 = spark.createDataFrame(rows1, "user_id long, d date")
    b2 = spark.createDataFrame(rows2, "user_id long, d date")
    return b1, b2


def test_presence_mv_merges_distinct_and_skips_replay(spark):
    from twitter_flink_spark.streaming.pipeline import PresenceMV

    mv = PresenceMV(spark, key_col="user_id", field_col="d")
    b1, b2 = _mk_batches(spark)
    mv.merge_batch(b1, 0)
    mv.merge_batch(b2, 1)
    snap1 = {(r.user_id, r.d) for r in mv.snapshot().collect()}
    assert snap1 == {
        (1, date(2024, 1, 1)),
        (1, date(2024, 1, 2)),
        (2, date(2024, 1, 2)),
        (3, date(2024, 1, 1)),
    }
    # at-least-once replay of batch 1 must be a no-op
    mv.merge_batch(b2, 1)
    snap2 = {(r.user_id, r.d) for r in mv.snapshot().collect()}
    assert snap2 == snap1


def test_grouped_count_mv_equals_batch_counts(spark):
    from twitter_flink_spark.streaming.pipeline import GroupedCountMV

    rows1 = [("a", 1), ("a", 1), ("b", 2)]
    rows2 = [("a", 1), ("a", 2), ("b", 2)]
    b1 = spark.createDataFrame(rows1, "event_type string, user_id long")
    b2 = spark.createDataFrame(rows2, "event_type string, user_id long")
    mv = GroupedCountMV(
        spark,
        key_cols=["event_type", "user_id"],
        key_schema="event_type string, user_id long",
    )
    mv.merge_batch(b1, 0)
    mv.merge_batch(b2, 1)
    got = {
        (r.event_type, r.user_id): r.cnt for r in mv.snapshot().collect()
    }
    want = Counter()
    for et, u in rows1 + rows2:
        want[(et, u)] += 1
    assert got == dict(want)
    # replayed batch id: no double counting
    mv.merge_batch(b2, 1)
    got2 = {
        (r.event_type, r.user_id): r.cnt for r in mv.snapshot().collect()
    }
    assert got2 == got


# --- Winnowing: the coverage guarantee --------------------------------------


def test_winnowing_selects_min_per_window(spark):
    """Reference winnowing on a small doc: every w-window's min gram
    hash must appear in the selected set, and nothing else."""
    import hashlib

    from twitter_flink_spark.queries.textops import _WIN_W

    text = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(7, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile, os

    d = tempfile.mkdtemp(prefix="tfs-win-")
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    from twitter_flink_spark.queries.textops import winnowing_fingerprints

    got = {
        r.fingerprint: r.n_windows
        for r in winnowing_fingerprints(spark, d).collect()
    }
    toks = text.split()
    grams = [
        hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()
        for i in range(len(toks) - 2)
    ]
    want = Counter()
    for ws in range(len(grams) - _WIN_W + 1):
        want[min(grams[ws : ws + _WIN_W])] += 1
    assert got == dict(want)


# --- Kneser-Ney: reference implementation pin -------------------------------


def test_kn_bigram_matches_python_reference(spark):
    """Interpolated KN (D=0.75) on the sf0.001 corpus: per-doc log sums
    must match an independent dict-based implementation (rounded per
    bigram at 10 dp exactly like the query)."""
    from twitter_flink_spark.queries.textops import kn_bigram_doc_scores
    from twitter_flink_spark.sources.tables import load_table

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_DIR, "documents").collect()
        if len(r.text.split(" ")) >= 2
    }
    big = Counter()
    ctx = Counter()
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
            ctx[a] += 1
    fw = Counter()
    pc = Counter()
    for a, b in big:
        fw[a] += 1
        pc[b] += 1
    t = float(len(big))
    lp = {
        (a, b): round(
            math.log(
                (max(c - 0.75, 0.0) + 0.75 * fw[a] * (pc[b] / t)) / ctx[a]
            ),
            10,
        )
        for (a, b), c in big.items()
    }
    expected = {}
    for did, toks in docs.items():
        pairs = list(zip(toks, toks[1:]))
        expected[did] = (
            len(pairs),
            round(sum(lp[p] for p in pairs), 6),
        )
    got = {
        r.doc_id: (r.n_bigrams, round(r.kn_logprob, 6))
        for r in kn_bigram_doc_scores(spark, SF_DIR).collect()
    }
    assert got == expected
