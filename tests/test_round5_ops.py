"""Round-5 operators vs pure-Python reference implementations — the same
pinning discipline as test_bpe/test_graph: the DuckDB oracle certifies
cross-engine agreement; these tests certify the ALGORITHM against an
independent sequential implementation on small controlled inputs."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

SF_DIR = "/root/testdata/sf0.001"


# --- MMR greedy rerank ------------------------------------------------------


def _ref_mmr(cands, pair_sim, lam, k):
    """cands: {nid: rel}; pair_sim: {(a, b): sim}. Returns
    [(rank, nid, score)] with floor-1e-6 scores, ties by id."""
    selected = []
    out = []
    for r in range(1, k + 1):
        best = None
        for nid, rel in cands.items():
            if nid in (s for s, _ in selected):
                continue
            if selected:
                ms = max(pair_sim[(nid, s)] for s, _ in selected)
                raw = lam * rel - (1.0 - lam) * ms
            else:
                raw = lam * rel
            key = (-raw, nid)
            if best is None or key < best[0]:
                best = (key, nid, raw)
        if best is None:
            break
        _, nid, raw = best
        selected.append((nid, raw))
        out.append((r, nid, math.floor(raw * 1e6) / 1e6))
    return out


def test_mmr_matches_reference(spark):
    """Run the registered MMR query and replay the greedy selection in
    pure Python from the SAME rounded relevance/pairwise-sim inputs the
    query derives — the unrolled DataFrame rounds must pick identically."""
    from pyspark.sql import functions as F

    from twitter_flink_spark.operators.similarity import cosine, topk_neighbors
    from twitter_flink_spark.queries.similarity import (
        _MMR_CAND,
        _MMR_K,
        _MMR_LAMBDA,
        mmr_diversified_topk,
    )
    from twitter_flink_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    cand_rows = topk_neighbors(emb, queries, k=_MMR_CAND).collect()
    cands: dict[int, dict[int, float]] = {}
    for r in cand_rows:
        cands.setdefault(r.query_id, {})[r.neighbor_id] = r.cosine
    # pairwise sims among each query's candidates, rounded like the query
    ids = sorted({nid for c in cands.values() for nid in c})
    vecs = {
        r.vec_id: r.embedding
        for r in emb.where(F.col("vec_id").isin(ids)).collect()
    }

    def cos(a, b):
        da = sum(x * y for x, y in zip(vecs[a], vecs[b]))
        na = math.sqrt(sum(x * x for x in vecs[a]))
        nb = math.sqrt(sum(x * x for x in vecs[b]))
        return round(da / (na * nb), 6)

    got = {
        (r.query_id, r.mmr_rank): (r.neighbor_id, r.mmr_score)
        for r in mmr_diversified_topk(spark, SF_DIR).collect()
    }
    for qid, cmap in cands.items():
        psim = {
            (a, b): cos(a, b) for a in cmap for b in cmap if a != b
        }
        ref = _ref_mmr(cmap, psim, _MMR_LAMBDA, _MMR_K)
        for rank, nid, score in ref:
            gnid, gscore = got[(qid, rank)]
            assert gnid == nid, (qid, rank, gnid, nid)
            assert abs(gscore - score) < 1e-9, (qid, rank, gscore, score)


# --- SQ8 scalar quantization ------------------------------------------------


def test_sq8_error_bounded_and_codes_in_range(spark):
    """Every code must be an int in [0, 255]; the per-vector squared
    reconstruction error must stay below the quantization-cell bound
    sum_d step_d^2 (floor quantization errs < one step per dimension)."""
    from pyspark.sql import functions as F

    from twitter_flink_spark.queries.similarity import sq8_encode_embeddings
    from twitter_flink_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    dims = emb.select(
        F.posexplode(
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        ).alias("dim", "val")
    )
    steps = {
        r.dim: (r.mx - r.mn) / 255.0
        for r in dims.groupBy("dim")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
        .collect()
    }
    bound = sum(s * s for s in steps.values())
    rows = sq8_encode_embeddings(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        codes = [int(c) for c in r.codes.split(",")]
        assert len(codes) == 64
        assert all(0 <= c <= 255 for c in codes), r.vec_id
        assert 0.0 <= r.sq_err <= bound + 1e-6, (r.vec_id, r.sq_err, bound)


# --- time-weighted average --------------------------------------------------


_twa_events = st.lists(
    st.tuples(
        st.integers(0, 86_400_000),  # t_ms
        st.floats(0.01, 500.0, allow_nan=False),
    ),
    min_size=2,
    max_size=20,
)


@settings(**_SETTINGS)
@given(evs=_twa_events)
def test_time_weighted_average_matches_reference(spark, evs):
    """The windowed integral must equal the sequential step-function
    integral computed in pure Python from the same (ms, floor(v*100))
    reductions."""
    import datetime

    from twitter_flink_spark.queries import temporal as T

    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1)
            + datetime.timedelta(milliseconds=t),
            7,
            "view",
            float(v),
            None,
        )
        for i, (t, v) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import os
    import tempfile

    d = os.path.join(tempfile.gettempdir(), "tfs-twa-prop")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = T.time_weighted_value_per_user(spark, d).collect()

    pts = sorted(
        (int(t), math.floor(v * 100)) for (t, v), _ in zip(evs, evs)
    )
    ivs = [
        (pts[i][1], pts[i + 1][0] - pts[i][0]) for i in range(len(pts) - 1)
    ]
    total = sum(dur for _, dur in ivs)
    if total == 0:
        assert got == []
        return
    weighted = sum(v * dur for v, dur in ivs)
    twa = math.floor(weighted / (total * 100.0) * 1e6) / 1e6
    assert len(got) == 1
    r = got[0]
    assert r.total_dur_ms == total
    assert r.weighted == weighted
    assert abs(r.twa_value - twa) < 1e-9


# --- cohort retention -------------------------------------------------------


def test_cohort_retention_matches_reference(spark):
    """Replay the cohort assignment + retention counting in pure Python
    over the fixture's (user, day) activity set."""
    from pyspark.sql import functions as F

    from twitter_flink_spark.queries.temporal import cohort_retention_matrix
    from twitter_flink_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    act = {
        (r.user_id, r.d)
        for r in ev.select(
            "user_id", F.to_date("ts").alias("d")
        ).distinct().collect()
    }
    first = {}
    for u, d in act:
        if u not in first or d < first[u]:
            first[u] = d
    size = {}
    for u, d in first.items():
        size[d] = size.get(d, 0) + 1
    cells = {}
    for u, d in act:
        key = (first[u], (d - first[u]).days)
        cells.setdefault(key, set()).add(u)
    got = {
        (r.cohort_day, r.day_offset): (
            r.n_active,
            r.cohort_size,
            r.retention,
        )
        for r in cohort_retention_matrix(spark, SF_DIR).collect()
    }
    assert len(got) == len(cells)
    for (cd, off), users in cells.items():
        n_active, cohort_size, retention = got[(cd.isoformat(), off)]
        assert n_active == len(users)
        assert cohort_size == size[cd]
        assert retention == math.floor(len(users) * 1e6 / size[cd]) / 1e6


# --- CUSUM excursion --------------------------------------------------------


def test_cusum_matches_reference(spark):
    """The integer random walk per event type must match a sequential
    replay from the same floor(x*1e4) reductions."""
    from twitter_flink_spark.queries.quality import cusum_value_excursion
    from twitter_flink_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    rows = ev.select("event_type", "ts", "event_id", "value").collect()
    # the query's exact integer mean: floor(sum(floor(v*1e4)) / n) —
    # reproducible in pure Python with no float-summation caveat
    sum4 = sum(math.floor(r.value * 10000) for r in rows)
    mu4 = sum4 // len(rows)
    walks: dict[str, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.ts, r.event_id)):
        w = walks.setdefault(r.event_type, [0])
        w.append(w[-1] + math.floor(r.value * 10000) - mu4)
    got = {
        r.event_type: (r.n_events, r.max_cusum4, r.min_cusum4, r.excursion4)
        for r in cusum_value_excursion(spark, SF_DIR).collect()
    }
    assert set(got) == set(walks)
    for et, w in walks.items():
        prefix = w[1:]  # drop the seed 0 — the query has no empty prefix
        assert got[et] == (
            len(prefix),
            max(prefix),
            min(prefix),
            max(prefix) - min(prefix),
        ), et


# --- duplicated n-gram span coverage ---------------------------------------


def test_duplicate_span_coverage_matches_reference(spark):
    """Interval-union coverage must equal a pure-Python union of
    [pos, pos+4] spans over cross-document 5-grams."""
    from twitter_flink_spark.queries.dedup import (
        _SPAN_N,
        duplicate_ngram_span_fraction,
    )
    from twitter_flink_spark.sources.tables import load_table

    docs = {
        r.doc_id: [t for t in r.text.split(" ") if t]
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    gram_docs: dict[tuple, set] = {}
    starts: dict[int, list[tuple]] = {}
    for did, toks in docs.items():
        for i in range(len(toks) - _SPAN_N + 1):
            g = tuple(toks[i : i + _SPAN_N])
            gram_docs.setdefault(g, set()).add(did)
            starts.setdefault(did, []).append((i + 1, g))
    expected = {}
    for did, toks in docs.items():
        if len(toks) < _SPAN_N:
            continue
        dup_pos = sorted(
            p for p, g in starts.get(did, []) if len(gram_docs[g]) >= 2
        )
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + _SPAN_N))
        expected[did] = (len(toks), len(dup_pos), len(covered))
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_grams, r.covered_tokens)
        for r in duplicate_ngram_span_fraction(spark, SF_DIR).collect()
    }
    assert got == expected


# --- driver-canon guard plumbing -------------------------------------------


def test_driver_canon_guard_catches_single_column_arrays(spark):
    """A 1-column array frame takes pandas' nargsort path (ValueError),
    not the multi-column lexsort path (TypeError) — compare() must report
    both as 'driver canon would crash', never propagate."""
    import numpy as np
    import pandas as pd

    from tests.oracle import compare

    df = spark.createDataFrame(
        [([1, 2],), ([3, 4],)], "xs array<int>"
    )
    oracle_df = pd.DataFrame(
        {"xs": [np.array([1, 2]), np.array([3, 4])]}
    )
    problems = compare(df, oracle_df)
    assert problems and "driver canon would crash" in problems[0]
