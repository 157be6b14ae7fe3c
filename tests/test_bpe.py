"""BPE merge-learning operator vs a pure-Python reference implementation
of the classic algorithm (count all adjacent pairs weighted by word
frequency; take most frequent with lexicographic tie-break; apply greedy
leftmost-nonoverlapping; repeat)."""

from __future__ import annotations


def _reference_bpe(word_weights: dict[str, int], n_merges: int):
    """Sequential reference: returns [(step, a, b, merged, cnt)]."""
    tables = {w: [c for c in w] for w in word_weights}
    out = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in tables.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + word_weights[w]
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        out.append((step, best[0], best[1], best[0] + best[1], counts[best]))
        a, b = best
        for w, syms in tables.items():
            merged = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            tables[w] = merged
    return out


def test_bpe_learn_matches_reference(spark):
    from twitter_flink_spark.operators.bpe import bpe_learn

    weights = {
        "lower": 5,
        "lowest": 2,
        "newer": 6,
        "wider": 3,
        "new": 2,
        "aaaa": 4,  # run: exercises greedy non-overlap parity
    }
    words = spark.createDataFrame(
        list(weights.items()), "word string, weight long"
    )
    got = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.cnt)
        for r in bpe_learn(words, 5).orderBy("step").collect()
    ]
    assert got == _reference_bpe(weights, 5)


def test_bpe_greedy_run_semantics(spark):
    """'aaaa' with merge (a,a) must become [aa, aa] — the sequential
    leftmost scan — not [aa, a, a] (one merge) or [aa, aa] overlapping
    artifacts; verified via the learned second round which counts pairs
    over the POST-merge table."""
    from twitter_flink_spark.operators.bpe import (
        apply_merge,
        char_symbol_table,
    )

    words = spark.createDataFrame([("aaaaa", 1)], "word string, weight long")
    t = char_symbol_table(words)
    best = spark.createDataFrame([("a", "a")], "a string, b string")
    after = apply_merge(t, best).orderBy("rn").collect()
    assert [r.sym for r in after] == ["aa", "aa", "a"]
    assert [r.rn for r in after] == [1, 2, 3]


def _reference_bpe_encode(word_weights: dict[str, int], n_merges: int):
    """Final segmentation after applying all learned merges."""
    tables = {w: [c for c in w] for w in word_weights}
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in tables.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + word_weights[w]
        if not counts:
            break
        a, b = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        for w, syms in tables.items():
            merged = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            tables[w] = merged
    return tables


def test_bpe_encode_matches_reference(spark):
    from twitter_flink_spark.operators.bpe import bpe_encode

    weights = {
        "lower": 5,
        "lowest": 2,
        "newer": 6,
        "wider": 3,
        "new": 2,
        "aaaa": 4,
    }
    words = spark.createDataFrame(
        list(weights.items()), "word string, weight long"
    )
    rows = bpe_encode(words, 4).orderBy("word", "rn").collect()
    got: dict[str, list[str]] = {}
    for r in rows:
        got.setdefault(r.word, []).append(r.sym)
    assert got == _reference_bpe_encode(weights, 4)


def test_bpe_survives_merge_dry_out(spark):
    """When every pair is merged away before n_merges rounds, learn must
    return only the rules it actually found and encode must return the
    fully-merged table — NOT an empty frame (the empty-argmax cross join
    in apply_merge would otherwise wipe the symbol table)."""
    from twitter_flink_spark.operators.bpe import bpe_encode, bpe_learn

    words = spark.createDataFrame([("ab", 3)], "word string, weight long")
    # only one pair exists; ask for 5 merges
    rules = bpe_learn(words, 5).collect()
    assert [(r.step, r.merged) for r in rules] == [(1, "ab")]
    enc = bpe_encode(words, 5).collect()
    assert [(r.word, r.rn, r.sym) for r in enc] == [("ab", 1, "ab")]
    # degenerate: no pair at all, even on round 1
    singles = spark.createDataFrame([("a", 2)], "word string, weight long")
    assert bpe_learn(singles, 3).collect() == []
    enc1 = bpe_encode(singles, 3).collect()
    assert [(r.word, r.rn, r.sym) for r in enc1] == [("a", 1, "a")]
