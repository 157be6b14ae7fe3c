"""Multimodal column plumbing (north-star: SURVEY.md §2.3).

Images/audio/video are opaque `binary` columns with typed metadata. The
Spark-side plumbing — schema, Arrow batch shape, mapInPandas signature,
partition sizing — is real and tested; the actual media decode is STUBBED:
the container ships no image/audio libraries, so `decode_media_meta` tries
the real decoder import and falls back to a deterministic fake that derives
metadata purely from the payload bytes (making the operator oracle-checkable
end-to-end).

Scale notes: media payloads dominate row size, so the decode operator (a)
selects ONLY (id, payload) into the UDF — metadata-only downstream plans
never move the bytes again; (b) runs via mapInPandas so each Arrow batch
amortizes Python crossing; (c) for 100 TB of media you bound
`spark.sql.files.maxPartitionBytes` and rely on batch iteration (the
iterator signature) so a partition never materializes fully in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_META_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, format string"
)

FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_offset long, frame_len long"


try:  # resolved ONCE per worker: a failed import inside the per-row loop
    # would rescan sys.path for every payload (imports that fail are not
    # cached), turning the decode hot path into filesystem calls
    import PIL.Image as _pil_image  # type: ignore[import-not-found]
except ImportError:
    _pil_image = None


def _decode_one(payload: bytes) -> tuple[int, int, str]:
    """Decode one payload to (width, height, format).

    Uses PIL when importable AND the bytes are a real image; in every other
    case (no PIL in this container, or non-image bytes like the text-derived
    fixture payloads) falls back to the deterministic fake, which derives
    metadata purely from the payload so the operator stays oracle-checkable.
    """
    if _pil_image is not None:
        try:
            import io

            with _pil_image.open(io.BytesIO(payload)) as img:
                return (img.width, img.height, (img.format or "unknown").lower())
        except Exception:  # undecodable bytes → deterministic fake
            pass
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, "fake/deterministic")


def attach_payload(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Synthesize the opaque binary column (UTF-8 bytes of the text — the
    fixture stand-in for real media bytes)."""
    return docs.select(
        F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def decode_media_meta(with_payload: DataFrame) -> DataFrame:
    """mapInPandas decode: (doc_id, payload) → typed metadata rows.

    Iterator-of-batches signature: a partition streams through as Arrow
    batches; nothing materializes per-partition.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "format": [m[2] for m in meta],
                }
            )

    return with_payload.mapInPandas(decode, schema=DECODE_META_SCHEMA)


def resize_media(with_payload: DataFrame, stride: int = 4) -> DataFrame:
    """Resize for "image" payloads: deterministic byte-stride downsample
    (every ``stride``-th byte), the stub stand-in for PIL's resize — a real
    build swaps only the per-batch body. Emits (doc_id, resized binary) so
    downstream operators (decode, feature-extract, storage) chain on the
    resized column; resized length = ceil(n_bytes / stride)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": [bytes(p)[::stride] for p in pdf["payload"]],
                }
            )

    return with_payload.mapInPandas(resize, schema="doc_id long, resized binary")


def extract_features(with_payload: DataFrame, n_buckets: int = 16) -> DataFrame:
    """Feature extraction for opaque payloads: a byte-value histogram
    (bucket = byte % n_buckets) as `array<long>` counts — a REAL (not
    stubbed) content feature usable by the similarity operators downstream;
    a media build would swap in a CNN/audio embedding with the same
    (id, array) output shape. numpy-vectorized per Arrow batch."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts = [
                np.bincount(
                    np.frombuffer(bytes(p), dtype=np.uint8) % n_buckets,
                    minlength=n_buckets,
                ).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": counts})

    return with_payload.mapInPandas(
        feats, schema="doc_id long, features array<long>"
    )


def sample_frames(with_payload: DataFrame, n_frames_mod: int = 8) -> DataFrame:
    """Frame sampling for "video" payloads: deterministic frame table
    (doc_id, frame_idx, offset, length) — n_frames = n_bytes % mod + 1,
    frames evenly spaced. Pure plumbing: the byte-slicing downstream would
    be another mapInPandas."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                k = n % n_frames_mod + 1
                step = n // k if k else 0
                for i in range(k):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(i * step)
                    out["frame_len"].append(step if i < k - 1 else n - (k - 1) * step)
            yield pd.DataFrame(out)

    return with_payload.mapInPandas(frames, schema=FRAME_SAMPLE_SCHEMA)


def byte_histogram(with_payload: DataFrame) -> DataFrame:
    """mapInPandas: (doc_id, payload) → (doc_id, byte_value, cnt,
    n_bytes) rows — a REAL vectorized numpy computation over the raw
    bytes (np.unique per payload), unlike the deliberately-stubbed
    pixel decodes: byte histograms need no media library, so this path
    exercises the Arrow boundary with genuine per-byte work. The
    boundary stays INTEGER-ONLY (counts, not floats), so the Python
    side cannot introduce cross-engine numeric drift; any
    entropy/statistics math happens JVM-side downstream. ``n_bytes``
    (the payload length, = sum of the doc's cnt by construction) rides
    every row so downstream per-byte probabilities need NO second
    aggregate-and-join over the histogram — the total is known the
    moment the bytes are in hand."""
    import pandas as pd

    schema = "doc_id long, byte_value int, cnt long, n_bytes long"

    def gen(batches):
        import numpy as np

        for pdf in batches:
            ids = []
            vals = []
            cnts = []
            tots = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                u, c = np.unique(arr, return_counts=True)
                ids.extend([did] * len(u))
                vals.extend(int(x) for x in u)
                cnts.extend(int(x) for x in c)
                tots.extend([len(arr)] * len(u))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "byte_value": vals,
                    "cnt": cnts,
                    "n_bytes": tots,
                }
            )

    return with_payload.mapInPandas(gen, schema=schema)
