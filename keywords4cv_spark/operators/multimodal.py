"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as `binary` columns with struct
metadata; the Spark-side machinery (schema, Arrow batch shape,
mapInPandas signature, partitioning) is real and tested — only the
codec itself is stubbed, because no image/audio library ships in this
container:

- payload_metadata: mapInPandas over binary batches → byte length,
  md5, deterministic fake dimensions (the shape a real EXIF/probe
  pass would return)
- byte_histogram: 8-bin byte-value histogram per payload (numpy over
  Arrow buffers — the template for feature extraction)
- decode_image / sample_frames: the real codecs, stubbed behind
  import-try + NotImplementedError as the task mandates

At sandbox scale the payload is the utf-8 encoding of the text column
(deterministic fake); on a real corpus it's the html/media bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id long, n_bytes long, payload_md5 string, fake_width int, fake_height int"
)
HIST_SCHEMA = "doc_id long, " + ", ".join(f"bin{i} long" for i in range(8))


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the deterministic fake binary payload column."""
    return docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))


def payload_metadata(docs: DataFrame) -> DataFrame:
    """Typed metadata per binary payload via mapInPandas (Arrow batches)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b or b"")).hexdigest()
                    ),
                    "fake_width": (n_bytes % 640).astype("int32"),
                    "fake_height": (n_bytes % 480).astype("int32"),
                }
            )

    return with_payload(docs).mapInPandas(extract, META_SCHEMA)


def byte_histogram(docs: DataFrame, n_bins: int = 8) -> DataFrame:
    """Per-payload byte-value histogram (feature-extraction template)."""

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                counts = np.bincount(arr >> 5, minlength=n_bins)[:n_bins]
                rows.append([int(doc_id), *counts.tolist()])
            yield pd.DataFrame(
                rows, columns=["doc_id", *[f"bin{i}" for i in range(n_bins)]]
            )

    return with_payload(docs).mapInPandas(hist, HIST_SCHEMA)


def decode_image(payload: bytes) -> "object":
    """STUB: real image decode (PIL absent from this container)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - import gate
        raise NotImplementedError(
            "image decode requires PIL; container ships none — the Spark "
            "plumbing (binary column, mapInPandas batch shape) is what's "
            "under test here"
        ) from exc
    raise NotImplementedError("wire PIL decode here when the lib exists")


def sample_frames(payload: bytes, every: int = 1024) -> list[bytes]:
    """STUB-grade frame sampler: fixed-stride byte slices standing in for
    video frame extraction (deterministic; real codec absent)."""
    b = bytes(payload or b"")
    return [b[i : i + 16] for i in range(0, len(b), every)]
