"""Vocabulary-side fixtures (FIXTURES.md §4) mirroring the reference's
config-driven skill whitelist / negative keywords / abbreviations
(/root/reference/config.yaml:133-140, :1131+;
/root/reference/keyword_canonicalizer.py:59-96).

Terms are chosen to intersect the driver corpus vocabulary so the
operators are exercised non-trivially. Each is a tiny broadcast-side
relation in Spark and a VALUES CTE in the DuckDB oracles.
"""

from __future__ import annotations

# J2/O2 whitelist ("skills"): (category, skill)
SKILLS: list[tuple[str, str]] = [
    ("engine", "spark"),
    ("engine", "flink"),  # absent from corpus — exercises the miss path
    ("ops", "merge"),
    ("ops", "join"),
    ("ops", "sort"),
    ("data", "vector"),
    ("data", "table"),
]

# P9 negative keywords
NEGATIVE_KEYWORDS: list[str] = ["customer", "dup", "nonword"]

# P11 abbreviations (abbrev -> expansion); "agg" intersects the corpus
ABBREVIATIONS: list[tuple[str, str]] = [
    ("agg", "aggregate"),
    ("db", "database"),
    ("ml", "machine learning"),
]

# J3 fuzzy probes: misspellings to resolve against the corpus vocabulary
FUZZY_PROBES: list[str] = ["spak", "merg", "windw", "vektor", "qqqqq", "tabel"]

# J3 phrase probes for the multi-scorer family (ratio/token_sort/token_set):
# word swaps and duplicates are where the three scorers diverge
FUZZY_PHRASE_PROBES: list[str] = ["join merge", "scan tabel", "data data"]

# O3 per-field weights (reference section_weights, config.yaml:74-78),
# keyed on the documents.source column at sandbox scale
FIELD_WEIGHTS: list[tuple[str, float]] = [
    ("src0", 1.8),
    ("src1", 1.2),
]
DEFAULT_FIELD_WEIGHT = 1.0

WHITELIST_BOOST = 1.6


def skills_values_cte() -> str:
    rows = ", ".join(f"('{c}', '{s}')" for c, s in SKILLS)
    return f"skills(category, skill) AS (SELECT * FROM (VALUES {rows}) v)"


def negative_values_cte() -> str:
    rows = ", ".join(f"('{w}')" for w in NEGATIVE_KEYWORDS)
    return f"negative(word) AS (SELECT * FROM (VALUES {rows}) v)"


def abbrev_values_cte() -> str:
    rows = ", ".join(f"('{a}', '{e}')" for a, e in ABBREVIATIONS)
    return f"abbrev(abbrev, expansion) AS (SELECT * FROM (VALUES {rows}) v)"


def field_weights_case_sql(col: str = "source") -> str:
    whens = " ".join(
        f"WHEN {col} = '{f}' THEN {w}" for f, w in FIELD_WEIGHTS
    )
    return f"CASE {whens} ELSE {DEFAULT_FIELD_WEIGHT} END"
