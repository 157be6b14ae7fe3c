"""Join operators, centered on the reference's one join: the stateful
broadcast semi-join (O10).

Reference: `FilterTopNCoFlatMap` (`TopNHashtags.java:298-335`) keeps the
latest top-N in a per-task `String[]` and emits a tweet iff ANY of its tags
is in that array — i.e. `tweets SEMI JOIN topN ON array_contains(tweet.tags,
topN.tag)`, with the build side broadcast (`:131`).

Two Spark formulations, both provided:

1. `semi_join_array_contains` — direct: left_semi join on the theta predicate
   `array_contains(tags, tag)`. With `broadcast()` on the (<= N x windows)-row
   build side this is a BroadcastNestedLoopJoin; fine because the build side
   is tiny and broadcast, so it is still one pass over the probe side with no
   shuffle. This is the literal translation of `:312-320`.
2. `semi_join_exploded` — equi: explode the array, inner/semi join on tag
   equality, distinct by row id. Turns the theta join into a
   BroadcastHashJoin; preferred at scale when the array fan-out is bounded
   (a tweet has few tags) because hash probing beats per-row array scans.

At 100 TB both stream the probe side with ZERO shuffle (build side broadcast
from the driver); the exploded variant additionally keeps whole-stage codegen
through the probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semi_join_array_contains(
    probe: DataFrame,
    build: DataFrame,
    array_col: str,
    key_col: str,
) -> DataFrame:
    """Rows of ``probe`` whose ``array_col`` contains >= 1 value of
    ``build.key_col``. Build side is broadcast (reference `:131`)."""
    return probe.join(
        F.broadcast(build.select(key_col).distinct()),
        on=F.expr(f"array_contains({array_col}, {key_col})"),
        how="left_semi",
    )


def semi_join_exploded(
    probe: DataFrame,
    build: DataFrame,
    array_col: str,
    key_col: str,
    id_cols: tuple[str, ...],
) -> DataFrame:
    """Same semantics via explode + equi semi-join (BroadcastHashJoin).

    The pre-explode projection keeps only (row-identity, token) columns so
    the fan-out never widens the full rows; the final semi-join on
    ``id_cols`` recovers the original rows without duplication (left_semi
    dedups the build side internally — no distinct needed).
    """
    probe_tokens = probe.select(
        *[F.col(c) for c in id_cols], F.explode(F.col(array_col)).alias("__token")
    )
    matched_ids = probe_tokens.join(
        F.broadcast(build.select(F.col(key_col).alias("__token")).distinct()),
        on="__token",
        how="left_semi",
    ).select(*[F.col(c) for c in id_cols])
    return probe.join(matched_ids, on=list(id_cols), how="left_semi")


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: split each hot ``left_key`` value across
    ``n_salts`` reducers.

    The fact (left) side gets a deterministic salt from a non-key column
    (``pmod(xxhash64(salt_from), n)`` — hashing the KEY would map a hot key
    to one salt and change nothing); the dimension (right) side is
    replicated once per salt value. The join key becomes (key, salt), so a
    key holding 20% of all rows spreads over n reducers instead of one.

    Semantically identical to ``left.join(right, key)`` for inner/left
    joins. Prefer AQE's skew-join splitting when it fires (same idea,
    runtime-detected); explicit salting is for when the skew is known and
    the optimizer's thresholds miss it, or the join is shuffled-hash where
    AQE skew handling doesn't apply.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full outer would emit each unmatched right row once PER SALT
        # (the dimension side is replicated) — fail loudly, not wrongly
        raise ValueError(
            f"salted_equi_join preserves semantics only for inner/left joins, got {how!r}"
        )
    salted_l = left.withColumn(
        "__salt_l",
        F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).cast("int"),
    )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    salted_r = right.withColumn("__salt_r", F.explode(salts))
    joined = salted_l.join(
        salted_r,
        (salted_l[left_key] == salted_r[right_key])
        & (salted_l["__salt_l"] == salted_r["__salt_r"]),
        how,
    )
    return joined.drop("__salt_l", "__salt_r")


def null_routed_left_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Left equi-join that routes NULL-key left rows AROUND the shuffle.

    A null join key can never match, but Spark still hashes it: every
    null-key row lands in the pmod(hash(null)) partition, so a fact table
    where 30% of rows are unattributed (anonymous users, unparsed ids)
    concentrates 30% of the shuffle on one reducer — the classic
    null-skew failure AQE's skew split only patches after the fact. The
    fix is algebraic, not adaptive: null-key rows provably join to
    nothing, so they bypass the join entirely (a scan-side filter, no
    exchange) and re-enter via union with the right side's columns
    null-extended — exactly what the left join would have produced.

    Result is column-for-column identical to
    ``left.join(right, key, "left")``; only the exchange's row
    distribution changes."""
    if how not in ("left", "left_outer", "leftouter"):
        raise ValueError(
            f"null_routed_left_join only supports left joins, got {how!r}"
        )
    matched = left.where(F.col(key).isNotNull()).join(right, key, "left")
    right_only = [c for c in matched.columns if c not in left.columns]
    # typed nulls: an untyped VOID literal would fail the union resolve
    rtypes = {f.name: f.dataType for f in matched.schema.fields}
    passthrough = left.where(F.col(key).isNull()).select(
        "*", *[F.lit(None).cast(rtypes[c]).alias(c) for c in right_only]
    )
    # join(key) moves the key to the front; align by name, not position
    return matched.unionByName(passthrough.select(matched.columns))


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = 1 << 13,
    k: int = 3,
) -> DataFrame:
    """Bloom-prefiltered equi-join: cut the fact side's shuffle volume
    with a broadcast Bloom filter over the dimension's join keys BEFORE
    the join — the manual form of Spark's runtime bloom-filter injection
    (`spark.sql.optimizer.runtime.bloomFilter.*`), built explicitly so
    the threshold heuristics can't silently decline it.

    Why this exists at 100 TB: a selective dimension subset can be far
    too large to broadcast as a hash-join build side (rows + payload),
    while its Bloom filter is ``m`` BITS by construction — so the fact
    table drops non-joining rows scan-side, and the unavoidable shuffle
    join moves only survivors. Semantically transparent: a Bloom filter
    has no false negatives, and its false positives are eliminated by
    the exact join that follows — the result is row-identical to the
    plain join, which is exactly what the oracle checks.

    Mechanics: k ``xxhash64`` bit positions per key; the dimension side
    reduces to its <= m distinct set positions (bounded by the filter
    size REGARDLESS of dimension cardinality — the same bounded-artifact
    rule as `shingle_bloom_bits`), packed into m/64 LONG words that
    inline into the plan as one array literal; the fact-side membership
    test is k O(1) ``element_at`` word lookups + bit tests ANDed inside
    whole-stage codegen — no explode, no extra join, no Python. (Two
    rejected encodings, both measured: a py4j boolean-array literal
    costs ~15 s to SHIP at m=32k, and a '0'/'1' string literal probes
    via ``substr`` whose char-position walk is O(m) PER ROW — 15 s over
    600 k rows. The packed words are O(m/64) to ship and O(1) to
    probe.)"""
    member = bloom_membership_mask(dim, dim_key, fact_key, m=m, k=k)
    return fact.where(member).join(
        dim, fact[fact_key] == dim[dim_key]
    )


def bloom_membership_mask(
    dim: DataFrame,
    dim_key: str,
    probe_key: str,
    m: int = 1 << 13,
    k: int = 3,
) -> F.Column:
    """The Bloom membership predicate `bloom_prefilter_join` applies:
    builds the dimension's bit-set (one distinct on <= m integer
    positions — bounded by the filter size, not the dimension), packs
    it into m/64 long words inlined as one array literal, and returns
    the ANDed k-probe O(1) word-lookup-and-bit-test over ``probe_key``
    — a plain codegen-friendly Column usable in any `where`."""
    if m % 64:
        raise ValueError(f"m must be a multiple of 64, got {m}")

    def pos(col: str, i: int) -> F.Column:
        return F.pmod(F.xxhash64(F.lit(i), F.col(col)), F.lit(m))

    set_bits = {
        r["p"]
        for r in dim.select(
            F.explode(
                F.array(*[pos(dim_key, i) for i in range(k)])
            ).alias("p")
        )
        .distinct()
        .collect()  # <= m rows by construction
    }
    words = [0] * (m // 64)
    for p in set_bits:
        words[p >> 6] |= 1 << (p & 63)
    # Java longs are signed two's-complement; rewrap the high bit
    arr_sql = "array(" + ",".join(
        f"{w - (1 << 64) if w >= (1 << 63) else w}L" for w in words
    ) + ")"
    probes = []
    for i in range(k):
        p = f"pmod(xxhash64({i}, `{probe_key}`), {m})"
        probes.append(
            f"((element_at({arr_sql}, cast(({p}) div 64 as int) + 1)"
            f" & shiftleft(1L, cast(({p}) % 64 as int))) != 0)"
        )
    return F.expr(" AND ".join(probes))
