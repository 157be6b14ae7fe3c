"""Config resolution tests: properties-file defaults merged with CLI args,
CLI winning (reference `TopNHashtags.java:49-68`)."""

from __future__ import annotations

from twitter_flink_spark.config import PipelineConfig, from_properties, resolve


def test_defaults_match_reference_properties():
    cfg = PipelineConfig()
    assert (cfg.windowSize, cfg.windowSlide, cfg.N) == (300, 60, 10)
    assert cfg.window_size_str == "300 seconds"


def test_properties_then_cli_merge(tmp_path):
    props = tmp_path / "pipeline.properties"
    props.write_text("windowsize = 120\nn = 5\ntrack = spark,flink\n")
    cfg = from_properties(str(props))
    assert cfg.windowSize == 120 and cfg.N == 5
    assert cfg.track_terms == ["spark", "flink"]

    merged = resolve(["--properties", str(props), "--N", "7"])
    assert merged.windowSize == 120  # from file
    assert merged.N == 7  # CLI wins


def test_locations_and_followings_parse(tmp_path):
    """Endpoint parity with TwitterFilterEndpoint.java:46-66: locations
    (bounding boxes) and followings (user ids) resolve from properties and
    CLI like every other key."""
    props = tmp_path / "pipeline.properties"
    props.write_text(
        "locations = -122.75,36.8,-121.75,37.8;-74.0,40.0,-73.0,41.0\n"
        "followings = 123,456\n"
    )
    cfg = from_properties(str(props))
    assert cfg.location_boxes == [
        (-122.75, 36.8, -121.75, 37.8),
        (-74.0, 40.0, -73.0, 41.0),
    ]
    assert cfg.following_ids == [123, 456]

    merged = resolve(["--properties", str(props), "--followings", "789"])
    assert merged.following_ids == [789]  # CLI wins
    assert merged.location_boxes[0] == (-122.75, 36.8, -121.75, 37.8)

    bad = PipelineConfig(locations="1,2,3")
    try:
        bad.location_boxes
        raise AssertionError("3-coordinate box must be rejected")
    except ValueError:
        pass

    assert PipelineConfig().location_boxes == []
    assert PipelineConfig().following_ids == []


def test_run_registered_resolves_and_rejects(spark):
    from twitter_flink_spark.__main__ import run_registered

    df = run_registered(
        spark, "q6_forecast_revenue", "/root/testdata/sf0.001"
    )
    assert df.count() == 1
    import pytest

    with pytest.raises(SystemExit, match="close matches"):
        run_registered(spark, "q6_forecast_revenu", "/root/testdata/sf0.001")


def test_cli_mode_query_roundtrip():
    from twitter_flink_spark.config import resolve

    cfg = resolve(["--mode", "query", "--query", "dedup_exact"])
    assert cfg.mode == "query" and cfg.query == "dedup_exact"
    cfg2 = resolve(["--mode", "list"])
    assert cfg2.mode == "list" and cfg2.query is None
