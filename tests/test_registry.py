"""Registry hygiene: names are unique and the guard actually fires.

Round-12 verdict found `dedup_cluster_size_histogram` registered twice with
`register()` silently overwriting — the first definition (and its oracle)
became invisible dead code with no signal. `register()` now raises on a
duplicate name; these tests pin both the guard and the invariant that every
currently-registered name maps to exactly one live function.
"""

from __future__ import annotations

import pytest

from twitter_flink_spark import registry


def test_duplicate_registration_raises():
    assert "dedup_cluster_size_histogram" in registry.QUERIES
    with pytest.raises(ValueError, match="duplicate query registration"):

        @registry.register("dedup_cluster_size_histogram")
        def shadow(spark, sf_dir):  # pragma: no cover - must never register
            raise AssertionError("shadow registration executed")

    # the guard must not have replaced the live definition
    assert registry.QUERIES["dedup_cluster_size_histogram"].__name__ == (
        "dedup_cluster_size_histogram"
    )


def test_duplicate_does_not_clobber_oracle():
    before = registry.ORACLES.get("dedup_cluster_size_histogram")
    assert before is not None
    with pytest.raises(ValueError):
        registry.register("dedup_cluster_size_histogram", oracle="SELECT 1")(
            lambda spark, sf_dir: None
        )
    assert registry.ORACLES["dedup_cluster_size_histogram"] is before


def test_registry_size_unchanged_after_dead_block_removal():
    # r12 had 313 registered queries with the duplicate silently collapsing
    # two definitions into one name; after deleting the shadowed block the
    # registry must still hold every name (the live count stays 313+ as
    # rounds add queries — pin a floor, not an exact count).
    assert len(registry.QUERIES) >= 313
    assert set(registry.ORACLES) <= set(registry.QUERIES)
