"""The reference query set (FIXTURES.md §2): head terms, tail terms,
multi-word, and one absent term. Rank-identical top-k on these is the
north_rule correctness gate for both scorers (brute force and BMW).
"""

from __future__ import annotations

from keywords4cv_spark.textprep.normalize import tokenize

TOP_K = 10

QUERY_SET: list[tuple[int, str]] = [
    (0, "spark"),
    (1, "merge join"),
    (2, "the"),  # Zipf head term — exercises the skew path
    (3, "vector window batch"),
    (4, "zzznonexistentterm"),  # absent from corpus → zero hits
    (5, "data stream query"),
    (6, "customer"),
    (7, "hash table scan filter"),
]


def query_terms(query_text: str) -> list[str]:
    """Distinct query terms via the frozen tokenizer, order-preserving."""
    return list(dict.fromkeys(tokenize(query_text)))


def query_term_pairs() -> list[tuple[int, str]]:
    return [(qid, t) for qid, q in QUERY_SET for t in query_terms(q)]
