"""Deterministic Common-Crawl-style corpus synthesizer.

Produces the exact BASELINE.json input_hint shape —
``(url string, warc_ts timestamp, html binary, text string,
lang string)`` — as a ``spark.range`` frame expanded by a vectorized
``mapInPandas`` generator. Every value is a pure function of
``(doc_id, seed)`` (splitmix64 in numpy), so the same ``(n_docs,
seed)`` yields a byte-identical table at any parallelism — which is
what lets the scaling benchmark run the *same input* at local[8] and
local[32].

(Earlier column-expression version built 60×|V| nested CASE trees —
14 MB task binaries, minutes per 1k docs. The numpy path generates
200k docs in seconds.)

Content design (FIXTURES.md §1):
- Zipfian vocabulary (~2k terms, P(rank) ∝ u² bias): head terms hit
  most docs (exercises salted SPIMI), deep tail is rare;
- section headings (``requirements:``/``education:``/…) for
  section-weighting operators;
- sentence punctuation (a period every SENT_WORDS words) so sentence
  segmentation (P6) and ±w-sentence context windows (J4) operate on
  real multi-sentence structure;
- URLs, emails, hyphenated skills for the normalizer;
- deterministic lang mix (~25% non-en) and 1-in-997 empty-text rows;
- ``html`` wraps ``text`` in head/nav/footer boilerplate — the
  ``extract_text`` UDF must recover ``text`` byte-identically per url
  (the input_hint invariant, tests/test_corpus.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

HEAD_VOCAB = [
    "the", "data", "spark", "index", "query", "search", "token", "merge",
    "join", "scan", "filter", "sort", "hash", "batch", "stream", "vector",
    "window", "table", "column", "row", "engine", "shard", "block", "score",
    "rank", "crawl", "parse", "fetch", "cache", "store", "codec", "skew",
]
VOCAB = np.array(HEAD_VOCAB + [f"term{i:04d}" for i in range(2000)])
HYPHEN_SKILLS = np.array(["scikit-learn", "spark-sql", "day-to-day"])
SECTIONS = np.array(["requirements", "education", "experience"])
LANGS = np.array(["en", "en", "en", "en", "en", "en", "de", "fr"])

SCHEMA = (
    "doc_id long, url string, warc_ts timestamp, html binary, "
    "text string, lang string"
)

_HTML_PRE = (
    "<html><head><title>doc</title><style>p{}</style></head><body>"
    "<nav>home | about | <a href='/x'>links</a></nav><p>"
)
_HTML_POST = "</p><footer>&copy; corp</footer></body></html>"


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (public-domain PRNG finalizer)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(keys: np.ndarray) -> np.ndarray:
    return _splitmix64(keys).astype(np.float64) / float(2**64)


SENT_WORDS = 8  # words per synthetic sentence


def _sentence_join(ws) -> str:
    """Join words into period-terminated sentences of SENT_WORDS words."""
    return ". ".join(
        " ".join(ws[j : j + SENT_WORDS]) for j in range(0, len(ws), SENT_WORDS)
    )


def synth_batch(ids: np.ndarray, seed: int, words_per_doc: int) -> pd.DataFrame:
    """Rows for the given doc ids — THE generator; pure (ids, seed) fn.

    Shared by the Spark mapInPandas path and the Spark-free pandas path
    so both produce byte-identical tables."""
    v = len(VOCAB)
    w = words_per_doc
    salt = np.uint64(seed * 1_000_003)
    epoch = pd.Timestamp("2025-01-01 00:00:00")

    ids = ids.astype(np.uint64)
    n = ids.size
    keys = (ids[:, None] * np.uint64(w) + np.arange(w, dtype=np.uint64)) ^ salt
    u = _u01(keys)
    ranks = np.minimum((v * u * u * u).astype(np.int64), v - 1)
    words = VOCAB[ranks]  # (n, w) strings

    extra = _splitmix64(ids ^ salt ^ np.uint64(0xABCDEF))
    skills = HYPHEN_SKILLS[(extra % np.uint64(len(HYPHEN_SKILLS))).astype(int)]
    sec1 = SECTIONS[((extra >> np.uint64(8)) % np.uint64(len(SECTIONS))).astype(int)]
    langs = LANGS[((extra >> np.uint64(16)) % np.uint64(len(LANGS))).astype(int)]

    half = w // 2
    texts = []
    for i in range(n):
        did = int(ids[i])
        if did % 997 == 996:
            texts.append("")
            continue
        texts.append(
            f"{sec1[i]}: "
            + _sentence_join(words[i, :half])
            + ". education: "
            + _sentence_join(words[i, half:])
            + f". {skills[i]} see https://example.com/p/{did}"
            + f" mail team{did}@corp.example"
        )
    html = [(_HTML_PRE + t + _HTML_POST).encode() for t in texts]
    return pd.DataFrame(
        {
            "doc_id": ids.astype("int64"),
            "url": [f"https://crawl.example/doc/{int(i)}" for i in ids],
            "warc_ts": epoch
            + pd.to_timedelta((ids % np.uint64(86_400)).astype("int64"), unit="s"),
            "html": html,
            "text": texts,
            "lang": langs,
        }
    )


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    words_per_doc: int = 60,
    n_partitions: int | None = None,
) -> DataFrame:
    """The input_hint documents table, deterministic in (n_docs, seed)."""
    parts = n_partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield synth_batch(pdf["id"].to_numpy(np.uint64), seed, words_per_doc)

    return base.mapInPandas(gen, SCHEMA)


def ensure_synth_parquet(
    path: str, n_docs: int, seed: int = 42, words_per_doc: int = 60
) -> str:
    """Materialize the corpus WITHOUT Spark (pandas + pyarrow), so DuckDB
    oracles can read the file even if they run before any Spark query.
    Idempotent; identical content to synth_documents by construction."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    done = os.path.join(path, "_PANDAS_SUCCESS")
    if os.path.exists(done):
        return path
    if os.path.exists(path):  # stale partial/Spark-written dir: start clean
        import shutil

        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    pdf = synth_batch(np.arange(n_docs, dtype=np.uint64), seed, words_per_doc)
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    # match Spark's physical type for warc_ts (timestamp, not ns)
    table = table.set_column(
        table.schema.get_field_index("warc_ts"),
        "warc_ts",
        table["warc_ts"].cast(pa.timestamp("us")),
    )
    pq.write_table(table, os.path.join(path, "part-0.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return path
