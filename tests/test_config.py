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
