"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as `binary` columns with struct
metadata, exactly as a 100 TB multimodal corpus would store them. No
image/audio library ships in this container, so the codecs implemented
here are ones that need none:

- BMP (24-bit uncompressed, BITMAPINFOHEADER) encode + decode in pure
  numpy — a real, byte-level container format, round-trip tested
- binary PPM (P6) decode — the other lib-free raster format
- WAV (RIFF PCM16) encode + decode — a real chunk-walking parser
  (fmt /data discovery, odd-size pad bytes), pure struct + numpy
- resize (nearest-neighbor + integer-factor mean-pool) in numpy
- a length-prefixed frame container (magic ``K4CV``) standing in for a
  video file: encode packs per-frame BMPs, ``sample_frames`` parses the
  header and strides through frames without materializing the rest

Formats that genuinely require an external codec (PNG/JPEG/MP4) are
dispatched to PIL when it exists and rejected with a clear error when
it does not — the Spark-side machinery (binary columns, Arrow batch
shape, mapInPandas signatures, partitioning) is identical either way:

- payload_metadata: mapInPandas over binary batches → byte length,
  md5, deterministic fake dimensions (the shape a real EXIF/probe
  pass would return)
- byte_histogram: 8-bin byte-value histogram per payload (numpy over
  Arrow buffers — the template for feature extraction)
- image_stats / video_frame_stats / audio_stats: full decode paths
  distributed over mapInPandas — synthesize a deterministic BMP /
  frame-container / WAV payload per doc, decode it, emit typed rows

At sandbox scale payloads are synthesized deterministically from
doc_id (no external data); on a real corpus they are the media bytes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id long, n_bytes long, payload_md5 string, fake_width int, fake_height int"
)
HIST_SCHEMA = "doc_id long, " + ", ".join(f"bin{i} long" for i in range(8))
IMAGE_STATS_SCHEMA = (
    "doc_id long, width int, height int, "
    "mean_r double, mean_g double, mean_b double, resized_md5 string"
)
FRAME_STATS_SCHEMA = "doc_id long, frame_idx int, width int, height int, mean_px double"
AUDIO_STATS_SCHEMA = (
    "doc_id long, n_samples int, sample_rate int, duration_ms double, "
    "mean_amp double, sum_sq long, zero_crossings int"
)


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


# --------------------------------------------------------------------------
# Real lib-free codecs: 24-bit BMP and binary PPM
# --------------------------------------------------------------------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP.

    Standard BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, each
    row padded to a 4-byte boundary, BGR byte order — byte-compatible
    with any BMP reader.
    """
    arr = np.asarray(rgb, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {arr.shape}")
    h, w = arr.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up scanlines, BGR channel order
    bgr = arr[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    pixel_data = rows.tobytes()
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_data)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixel_data


def _decode_bmp(payload: bytes) -> np.ndarray:
    data_offset, header_size = struct.unpack_from("<I I", payload, 10)
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w, h, _planes, bpp, compression = struct.unpack_from("<iiHHI", payload, 18)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    row_stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * row_stride, offset=data_offset
    ).reshape(h, row_stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb if top_down else rgb[::-1]


def _decode_ppm(payload: bytes) -> np.ndarray:
    # P6 header: magic, whitespace/comments, width, height, maxval, 1 ws byte
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos).reshape(
        h, w, 3
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (h, w, 3) uint8 RGB array.

    BMP (24-bit uncompressed) and binary PPM (P6) decode in pure numpy
    — no library needed. Other formats (PNG/JPEG/…) dispatch to PIL
    when present; absent, they raise NotImplementedError naming the
    missing codec, so callers can distinguish "bad bytes" (ValueError)
    from "codec not shipped" (NotImplementedError).
    """
    b = bytes(payload or b"")
    if len(b) < 16:
        raise ValueError(f"payload too short to be an image ({len(b)} bytes)")
    if b[:2] == b"BM":
        return _decode_bmp(b)
    if b[:2] == b"P6":
        return _decode_ppm(b)
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - import gate
        raise NotImplementedError(
            f"payload magic {b[:4]!r} needs an external codec (PIL); this "
            "container ships none — encode BMP/PPM for the lib-free path"
        ) from exc
    import io  # pragma: no cover - exercised only when PIL exists

    return np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))  # pragma: no cover


def resize_image(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize to (out_h, out_w, 3)."""
    arr = np.asarray(rgb)
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]


def mean_pool(rgb: np.ndarray, factor: int) -> np.ndarray:
    """Integer-factor mean-pool downscale (the thumbnailing kernel)."""
    arr = np.asarray(rgb, dtype=np.float64)
    h, w = arr.shape[:2]
    h2, w2 = h // factor, w // factor
    arr = arr[: h2 * factor, : w2 * factor]
    pooled = arr.reshape(h2, factor, w2, factor, -1).mean(axis=(1, 3))
    return pooled.astype(np.uint8)


# --------------------------------------------------------------------------
# Frame container (video stand-in): magic + length-prefixed BMP frames
# --------------------------------------------------------------------------

_FRAME_MAGIC = b"K4CV"


def encode_video(frames: list[np.ndarray]) -> bytes:
    """Pack RGB frames as length-prefixed BMPs under a ``K4CV`` header."""
    blobs = [encode_bmp(f) for f in frames]
    out = [_FRAME_MAGIC, struct.pack("<I", len(blobs))]
    for blob in blobs:
        out.append(struct.pack("<I", len(blob)))
        out.append(blob)
    return b"".join(out)


def sample_frames(payload: bytes, every: int = 2) -> list[np.ndarray]:
    """Decode every ``every``-th frame from a ``K4CV`` container.

    Walks the length-prefix index and decodes ONLY the sampled frames —
    the skip path never touches skipped pixel bytes, which is the
    access pattern a real seekable video container gives you.
    """
    b = bytes(payload or b"")
    if b[:4] != _FRAME_MAGIC:
        raise ValueError(f"not a {_FRAME_MAGIC!r} frame container")
    (n_frames,) = struct.unpack_from("<I", b, 4)
    pos, out = 8, []
    for idx in range(n_frames):
        (blob_len,) = struct.unpack_from("<I", b, pos)
        pos += 4
        if idx % every == 0:
            out.append(decode_image(b[pos : pos + blob_len]))
        pos += blob_len
    return out


# --------------------------------------------------------------------------
# Distributed decode paths (mapInPandas over Arrow batches)
# --------------------------------------------------------------------------


def synth_image(doc_id: int) -> np.ndarray:
    """Deterministic per-doc RGB test pattern (no external data)."""
    h = 8 + (doc_id % 8)
    w = 8 + ((doc_id * 3) % 8)
    y, x = np.mgrid[0:h, 0:w]
    c = np.arange(3)[None, None, :]
    return ((doc_id * 31 + y[..., None] * 7 + x[..., None] * 13 + c * 97) % 256).astype(
        np.uint8
    )


def image_payloads(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) with a real BMP per doc, built executor-side."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [encode_bmp(synth_image(int(d))) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, "doc_id long, payload binary")


def image_stats(docs: DataFrame, thumb: int = 4) -> DataFrame:
    """Decode → per-channel means + thumbnail fingerprint, distributed.

    The full decode/resize pipeline a training-data curation pass runs:
    parse the container bytes, compute channel statistics, mean-pool a
    ``thumb``×``thumb`` thumbnail and fingerprint it (the dedup key for
    near-identical images). One mapInPandas, no shuffle.
    """

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(payload)
                h, w = img.shape[:2]
                means = img.reshape(-1, 3).mean(axis=0)
                tiny = resize_image(img, thumb, thumb)
                rows.append(
                    [
                        int(doc_id),
                        int(w),
                        int(h),
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                        hashlib.md5(tiny.tobytes()).hexdigest(),
                    ]
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                    "resized_md5",
                ],
            )

    return image_payloads(docs).mapInPandas(stats, IMAGE_STATS_SCHEMA)


def video_frame_stats(docs: DataFrame, n_frames: int = 6, every: int = 2) -> DataFrame:
    """Frame-sample a per-doc synthetic container, one row per kept frame."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                payload = encode_video(
                    [synth_image(did * n_frames + i) for i in range(n_frames)]
                )
                for idx, frame in enumerate(sample_frames(payload, every=every)):
                    h, w = frame.shape[:2]
                    rows.append([did, idx, int(w), int(h), float(frame.mean())])
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "width", "height", "mean_px"]
            )

    return docs.select("doc_id").mapInPandas(stats, FRAME_STATS_SCHEMA)


# --------------------------------------------------------------------------
# Audio codec: RIFF/WAVE PCM16, pure struct + numpy
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an int16 sample array (mono: (n,), multi: (n, ch)) as a
    canonical RIFF/WAVE PCM16 file — fmt chunk + data chunk, the layout
    every WAV reader accepts."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM16 → ((n, channels) int16 array, sample rate).

    A real chunk walker: scans the chunk list for ``fmt `` and ``data``,
    skipping unknown chunks (LIST/INFO/cue …) including the RIFF odd-size
    pad byte — not a fixed-offset parse, so files from arbitrary writers
    decode too.
    """
    b = bytes(payload or b"")
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n_ch, rate, bps, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack_from("<HHI", b, pos)
            bps = struct.unpack_from("<H", b, pos + 14)[0]
            if audio_fmt != 1 or bps != 16:
                raise ValueError(
                    f"only PCM16 WAV supported (fmt={audio_fmt}, bits={bps})"
                )
        elif cid == b"data":
            data = b[pos : pos + size]
        pos += size + (size & 1)  # chunks are word-aligned
    if n_ch is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    arr = np.frombuffer(data, dtype="<i2")
    return arr.reshape(-1, n_ch), rate


def synth_audio(doc_id: int) -> tuple[np.ndarray, int]:
    """Deterministic per-doc mono int16 waveform (closed form, so the
    DuckDB oracle can recompute every sample without decoding bytes)."""
    n = 200 + (doc_id % 100)
    rate = 8000 + (doc_id % 4) * 4000
    i = np.arange(n, dtype=np.int64)
    samples = ((doc_id * 7919 + i * 4021) % 65536 - 32768).astype(np.int16)
    return samples, rate


def audio_stats(docs: DataFrame) -> DataFrame:
    """Encode → decode → per-clip features, distributed; zero shuffle.

    The audio-curation kernel: per doc a real WAV is written and parsed
    back executor-side, then reduced to the features a training-data
    filter keys on — duration, mean amplitude, energy (exact integer
    sum of squares, so the oracle compares without float-accumulation
    drift) and zero-crossing count (the classic voiced/unvoiced proxy).
    Single-division doubles only (sum/n), keeping DuckDB bit-parity.
    """

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                samples, rate = synth_audio(did)
                dec, dec_rate = decode_wav(encode_wav(samples, rate))
                x = dec[:, 0].astype(np.int64)
                n = len(x)
                crossings = int(np.count_nonzero(x[:-1] * x[1:] < 0))
                rows.append(
                    [
                        did,
                        n,
                        dec_rate,
                        float(n * 1000.0 / dec_rate),
                        float(int(x.sum()) / n),
                        int((x * x).sum()),
                        crossings,
                    ]
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_rate", "duration_ms",
                    "mean_amp", "sum_sq", "zero_crossings",
                ],
            )

    return docs.select("doc_id").mapInPandas(stats, AUDIO_STATS_SCHEMA)
