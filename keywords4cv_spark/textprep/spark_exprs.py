"""Spark column-expression twins of the frozen tokenizer.

This is the production hot path: pure `pyspark.sql.functions`
expressions, so normalization/tokenization stays JVM-side inside
whole-stage codegen — no Python in the loop at all. The pandas-UDF
variant (``udfs.py``) exists for the Arrow-UDF contract and as a
second parity witness; both must equal ``normalize.py`` output
byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from keywords4cv_spark.textprep.normalize import (
    EMAIL_PATTERN,
    LEMMA_EXCEPTIONS,
    NON_ALNUM_PATTERN,
    SEP_PATTERN,
    URL_PATTERN,
)


def normalized_col(col: Column) -> Column:
    """JVM twin of normalize.normalize_text (same regex order)."""
    c = F.lower(col)
    c = F.regexp_replace(c, URL_PATTERN, " ")
    c = F.regexp_replace(c, EMAIL_PATTERN, " ")
    c = F.regexp_replace(c, NON_ALNUM_PATTERN, " ")
    c = F.regexp_replace(c, SEP_PATTERN, " ")
    return F.trim(c)


def tokens_col(
    col: Column,
    min_token_len: int = 2,
    stopwords: frozenset[str] = frozenset(),
) -> Column:
    """array<string> of kept tokens. NB: F.filter (not array_except,
    which would dedup and break term frequencies). The lemma fold is a
    constant map literal lookup (element_at on a literal map → NULL for
    non-exceptions → coalesce) — stays in codegen, no UDF."""
    arr = F.split(normalized_col(col), " ")
    stop = sorted(stopwords)

    def keep(x: Column) -> Column:
        cond = F.length(x) >= min_token_len
        if stop:
            cond = cond & ~x.isin(*stop)
        return cond

    kept = F.filter(arr, keep)
    lemma_map = F.create_map(
        *[F.lit(x) for kv in sorted(LEMMA_EXCEPTIONS.items()) for x in kv]
    )
    return F.transform(kept, lambda t: F.coalesce(F.element_at(lemma_map, t), t))


def ngrams_col(tokens: Column, lo: int = 1, hi: int = 3) -> Column:
    """Contiguous space-joined n-grams via higher-order functions
    (transform/slice/sequence) — stays in codegen, no UDF.

    Prefer passing a materialized column (``withColumn("tokens", ...)``
    then ``F.col("tokens")``) so tokenization runs once, not once per
    n-gram width — though any expression is semantically correct.
    """
    # NB: the per-n lambda must stay single-argument — a `lambda i, n=n:`
    # default arg makes PySpark treat it as the (element, index) form.
    def gram_at(n: int):
        return lambda i: F.concat_ws(" ", F.slice(tokens, i, n))

    parts = []
    for n in range(lo, hi + 1):
        if n == 1:
            parts.append(tokens)
            continue
        grams = F.when(
            F.size(tokens) >= n,
            F.transform(F.sequence(F.lit(1), F.size(tokens) - (n - 1)), gram_at(n)),
        ).otherwise(F.array().cast("array<string>"))
        parts.append(grams)
    if len(parts) == 1:
        return parts[0]
    return F.concat(*parts)
