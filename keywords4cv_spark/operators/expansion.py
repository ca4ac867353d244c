"""Vocabulary expansion operators (SURVEY.md §2.3/§2.8).

- G4 synonym expansion: broadcast map explode — the static-table
  re-expression of the reference's WordNet/API synonym sources
  (/root/reference/keywords4cv.py:966-1019; the REST source S4 is an
  executor-I/O anti-pattern and stays out of the engine, SURVEY.md §2.1)
- U4 n-gram subsumption: drop a shorter n-gram when its token set is
  contained (overlap ratio ≥ threshold) in a longer kept n-gram
  (/root/reference/keyword_canonicalizer.py:167-231). The candidate
  join is an exact equi-join on sorted token-subset keys — skew-proof
  (a first-token seed join would fan out on Zipf head tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from keywords4cv_spark.config import DEFAULT_CONFIG, EngineConfig

def _load_default_synonyms() -> list[tuple[str, str]]:
    """The engine's synonym vocabulary, loaded from the packaged
    WordNet-substitute fixture (resources/synonyms.json) through the
    same loader shape as a user-supplied synonyms file — closing the
    reference's WordNet-generation gap (keywords4cv.py:999-1019)
    without the NLTK dependency: the table is FROZEN (deterministic,
    model-drift-free) but arrives through the S3 synonym-source path
    (sources/io.load_synonyms_rows), not inline constants. The fixture
    covers the gate vocabulary incl. in-corpus targets (merge→join,
    sort→order) so expansion hits real postings, and ships in the
    executor py-files zip (deploy.py packs .json resources)."""
    from importlib import resources

    from keywords4cv_spark.sources.io import load_synonyms_rows

    ref = resources.files("keywords4cv_spark").joinpath(
        "resources/synonyms.json"
    )
    # as_file: a real filesystem path even when the package is imported
    # from the py-files zip on an executor
    with resources.as_file(ref) as p:
        return load_synonyms_rows(str(p))


SYNONYMS: list[tuple[str, str]] = _load_default_synonyms()

# weight a query term contributed by expansion (synonym/abbreviation)
# carries relative to a literal query term — the reference treats
# expansion matches as secondary evidence (keywords4cv.py:966-1019
# expands keywords through synonym/abbreviation maps before matching)
SYNONYM_WEIGHT = 0.5


def expand_query_pairs(
    base_pairs: list[tuple[int, str]],
    weight: float = SYNONYM_WEIGHT,
) -> list[tuple[int, str, float]]:
    """Query-TIME vocabulary expansion: each (query_id, term) pair grows
    synonym terms and abbreviation-expansion words at ``weight``; literal
    terms keep weight 1.0 and win dedup (max weight per (query, term)).

    Driver-side by design — query sets and the static vocab maps are
    tiny constants; the EXPANDED pair list then flows into the normal
    broadcast-join query path (query/wand.py), so nothing here scales
    with the corpus. Mirrors the reference's pre-match keyword expansion
    (/root/reference/keywords4cv.py:966-1019,
    keyword_canonicalizer.py:141-165) as retrieval semantics."""
    from keywords4cv_spark import vocab
    from keywords4cv_spark.textprep.normalize import tokenize

    syn: dict[str, list[str]] = {}
    for t, s in SYNONYMS:
        syn.setdefault(t, []).append(s)
    ab: dict[str, list[str]] = {}
    for a, expansion in vocab.ABBREVIATIONS:
        ab.setdefault(a, []).extend(tokenize(expansion))
    weights: dict[tuple[int, str], float] = {}
    for qid, t in base_pairs:
        weights[(qid, t)] = 1.0
    for qid, t in base_pairs:
        for s in syn.get(t, []) + ab.get(t, []):
            key = (qid, s)
            weights[key] = max(weights.get(key, 0.0), weight)
    return [(qid, t, w) for (qid, t), w in sorted(weights.items())]


SUBSUME_OVERLAP = 0.8
# n-grams are keyword CANDIDATES (the reference subsumes extracted
# keywords, not the raw n-gram space); min corpus frequency keeps the
# vocabulary-level semantics and bounds both join sides
MIN_NGRAM_FREQ = 5


def synonym_expanded_counts(
    spark: SparkSession, docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Per-term counts after synonym expansion: every corpus occurrence of
    a term also counts once per synonym.

    The synonym map is a tiny driver-side constant, so the expansion is
    applied INSIDE one fused tokenize + partial-count pass (same shape
    as textprep/fused.py): the only exchange carries per-batch
    vocabulary partials — the explode → broadcast-join → union →
    groupBy shape this replaces streamed the corpus token relation
    twice through the aggregation."""
    from keywords4cv_spark.deploy import ensure_py_files

    ensure_py_files(spark)
    syn: dict[str, list[str]] = {}
    for t, s in SYNONYMS:
        syn.setdefault(t, []).append(s)
    if cfg.lang_filter and "lang" in docs.columns:
        docs = docs.filter(F.col("lang") == cfg.lang_filter)
    min_len, stop = cfg.min_token_len, cfg.stopwords

    def batches(it):
        from collections import Counter

        import pandas as pd

        from keywords4cv_spark.textprep.normalize import tokenize

        for pdf in it:
            c: Counter = Counter()
            for text in pdf["text"]:
                for t in tokenize(text, min_len, stop):
                    c[t] += 1
                    for s in syn.get(t, ()):
                        c[s] += 1
            if c:
                yield pd.DataFrame(
                    {
                        "term": list(c.keys()),
                        "pn": pd.array(list(c.values()), dtype="int64"),
                    }
                )

    return (
        docs.select("text")
        .mapInPandas(batches, "term string, pn long")
        .groupBy("term")
        .agg(F.sum("pn").alias("n"))
    )


def surviving_bigrams(
    docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG, overlap: float = SUBSUME_OVERLAP
) -> DataFrame:
    """Distinct corpus bigrams NOT subsumed by any distinct trigram.

    A bigram is subsumed when |tokens(bi) ∩ tokens(tri)| ≥
    ceil(overlap · |tokens(bi)|); with ≤2 distinct bigram tokens and
    0.8 that means EVERY bigram token appears in the trigram. So the
    candidate join is an exact equi-join on the sorted token(-pair)
    key — a single-token seed join would fan out quadratically on Zipf
    head tokens ("the" bigrams × "the" trigrams), which is the same
    skew lesson as the SPIMI build, applied to vocabulary joins.
    """
    # ONE fused tokenize pass emits bigram AND trigram partial counts
    # together (textprep/fused.py) — the posexplode + lead-window shape
    # this replaces ran the tokenize lineage once per gram width plus a
    # corpus-wide window shuffle+sort; the localCheckpointed count
    # relation is gram-vocabulary-sized
    from keywords4cv_spark.textprep.fused import gram_partial_counts

    counts = (
        gram_partial_counts(docs, cfg, (2, 3))
        .groupBy("width", "gram")
        .agg(F.sum("pn").alias("count"))
        .filter(F.col("count") >= MIN_NGRAM_FREQ)
        .localCheckpoint()
    )
    bigrams = (
        counts.filter(F.col("width") == 2)
        .select(F.col("gram").alias("bigram"), "count")
        .withColumn("btoks", F.array_sort(F.array_distinct(F.split("bigram", " "))))
        .withColumn("key", F.concat_ws(" ", "btoks"))
    )
    ttoks = (
        counts.filter(F.col("width") == 3)
        .withColumn("ttoks", F.array_sort(F.array_distinct(F.split("gram", " "))))
        .select("ttoks")
        .distinct()
    )
    # every non-empty token subset of a trigram's ≤3 distinct tokens, as a
    # sorted space-joined key: singles + pairs + the full set
    def subset_keys(arr):
        singles = F.transform(arr, lambda x: x)
        # NB sequence(a, b) with a > b yields a DESCENDING range, so the
        # pair generator must be gated on size >= 2
        pairs = F.when(
            F.size(arr) >= 2,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size(arr) - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, F.size(arr)),
                        lambda j: F.concat_ws(
                            " ", F.element_at(arr, i), F.element_at(arr, j)
                        ),
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.array_union(singles, pairs)

    tri_keys = ttoks.select(
        F.explode(subset_keys(F.col("ttoks"))).alias("key")
    ).distinct()
    # survivor ⇔ key ∉ tri_keys: one anti-join, no second bigram pass
    return bigrams.join(tri_keys, "key", "left_anti").select("bigram")
