"""Config / parameter resolution (reference O14+O15).

Mirrors the reference's `ParameterTool.fromPropertiesFile(...).mergeWith(
fromArgs(args))` resolution (`TopNHashtags.java:49-68`) and its property
keys (`TopNHashtags.properties:16-33`): properties file < CLI args, with
the same defaults (300 s window, 60 s slide, N=10, optional Redis target,
optional parallelism caps).
"""

from __future__ import annotations

import argparse
import configparser
from dataclasses import dataclass, fields

#: dataclass field types arrive as strings under PEP 563 — resolve them.
_FIELD_TYPES = {"int": int, "str": str}


def _ftype(fld) -> type:
    return _FIELD_TYPES[fld.type] if isinstance(fld.type, str) else fld.type


@dataclass
class PipelineConfig:
    # window/topN (TopNHashtags.properties:25-29)
    windowSize: int = 300  # seconds
    windowSlide: int = 60  # seconds
    N: int = 10
    # source-side filters (TwitterFilterEndpoint.java:46-66)
    track: str = ""  # comma-separated track terms
    language: str = ""  # comma-separated language codes
    # semicolon-separated bounding boxes "swLon,swLat,neLon,neLat;..."
    # (TwitterFilterEndpoint.java:38-40,57-60 endpoint.locations)
    locations: str = ""
    # comma-separated user ids (TwitterFilterEndpoint.java:42-44,52-55
    # endpoint.followings)
    followings: str = ""
    # sink (TopNHashtags.properties:30-31)
    redisHost: str = ""
    redisPort: int = 6379
    # parallelism caps (TopNHashtags.properties:32-33 / TopNHashtags.java:100-107)
    maxParallelism: int = 0  # 0 = unset
    parallelism: int = 0  # 0 = unset -> spark.sql.shuffle.partitions default

    @property
    def window_size_str(self) -> str:
        return f"{self.windowSize} seconds"

    @property
    def window_slide_str(self) -> str:
        return f"{self.windowSlide} seconds"

    @property
    def track_terms(self) -> list[str]:
        return [t.strip() for t in self.track.split(",") if t.strip()]

    @property
    def languages(self) -> list[str]:
        return [t.strip() for t in self.language.split(",") if t.strip()]

    @property
    def location_boxes(self) -> list[tuple[float, float, float, float]]:
        """Bounding boxes as (swLon, swLat, neLon, neLat) tuples."""
        boxes = []
        for box in self.locations.split(";"):
            if not box.strip():
                continue
            parts = [float(c) for c in box.split(",")]
            if len(parts) != 4:
                raise ValueError(
                    f"location box needs 4 coordinates, got {box!r}"
                )
            boxes.append(tuple(parts))
        return boxes

    @property
    def following_ids(self) -> list[int]:
        return [int(t) for t in self.followings.split(",") if t.strip()]


def from_properties(path: str) -> PipelineConfig:
    """Read a java-properties-style file (the reference's format)."""
    parser = configparser.ConfigParser()
    with open(path) as f:
        parser.read_string("[cfg]\n" + f.read())
    cfg = PipelineConfig()
    for fld in fields(PipelineConfig):
        if parser.has_option("cfg", fld.name.lower()):
            raw = parser.get("cfg", fld.name.lower())
            setattr(cfg, fld.name, _ftype(fld)(raw))
    return cfg


def resolve(args: list[str] | None = None) -> PipelineConfig:
    """properties file (if --properties given) merged with CLI args — CLI
    wins, like the reference's mergeWith (`TopNHashtags.java:55-57`)."""
    ap = argparse.ArgumentParser(prog="twitter_flink_spark")
    ap.add_argument("--properties", default=None)
    for fld in fields(PipelineConfig):
        ap.add_argument(f"--{fld.name}", type=_ftype(fld), default=None)
    ap.add_argument("--sf-dir", dest="sf_dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--mode", choices=["batch", "stream", "query", "list"], default="batch"
    )
    ap.add_argument("--query", default=None)
    ns = ap.parse_args(args)

    cfg = from_properties(ns.properties) if ns.properties else PipelineConfig()
    for fld in fields(PipelineConfig):
        val = getattr(ns, fld.name)
        if val is not None:
            setattr(cfg, fld.name, val)
    cfg.sf_dir = ns.sf_dir  # type: ignore[attr-defined]
    cfg.mode = ns.mode  # type: ignore[attr-defined]
    cfg.query = ns.query  # type: ignore[attr-defined]
    return cfg
