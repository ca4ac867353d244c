"""Sentence segmentation / keyword sections / context windows (P6/P8/J4)
against hand-computed expectations on literal documents, plus a
hypothesis parity property: Spark split == pure-Python spec == DuckDB.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from keywords4cv_spark.config import EngineConfig
from keywords4cv_spark.operators import sentences as sentops

CFG = EngineConfig(lang_filter=None)


def py_sentences(text: str) -> list[str]:
    """The pure-Python sentence-split spec (the parity target).

    NB trim semantics: Spark `trim` and DuckDB `trim` both strip ONLY
    0x20 spaces (not \\n/\\t) — the spec matches the engines, so a
    sentence consisting of a bare newline survives as its own row.
    """
    return [s.strip(" ") for s in re.split(r"[.!?•]+", text) if s.strip(" ")]


@settings(max_examples=150, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(list("abz .!?•:\n\t-")),
        max_size=120,
    )
)
def test_duckdb_sentence_split_parity(text):
    con = duckdb.connect()
    got = con.execute(
        "SELECT list_filter(list_transform("
        "string_split_regex(?, '[.!?•]+'), s -> trim(s)), s -> s != '')",
        [text],
    ).fetchone()[0]
    assert list(got) == py_sentences(text)


def test_spark_sentence_split_parity(spark):
    rows = [
        (i, t)
        for i, t in enumerate(
            [
                "", "...", "a.b.c", "one! two? three• four",
                "dots..everywhere.. .", "•lead and trail•",
                "requirements: x. y! z?", "no punctuation at all",
                " spaced . out ! ", "mix\n.lines\t? ok",
            ]
        )
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, list[str]] = {}
    for r in sentops.sentences(df).collect():
        got.setdefault(r.doc_id, []).append((r.sent_idx, r.sentence))
    for doc_id, text in rows:
        want = py_sentences(text)
        have = [s for _, s in sorted(got.get(doc_id, []))]
        assert have == want, (doc_id, text, have, want)


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        # doc 1: 4 sentences, headings at segment boundaries
        (1, "intro words here. requirements: spark and merge. also sort! education: table stuff?"),
        # doc 2: no headings, no punctuation → one sentence, 'general'
        (2, "spark table spark"),
        # doc 3: empty sentences from repeated punctuation
        (3, "one.. two... three. spark."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_sentences_split_and_index(spark, toy):
    got = {
        (r.doc_id, r.sent_idx): r.sentence
        for r in sentops.sentences(toy).collect()
    }
    assert got[(1, 0)] == "intro words here"
    assert got[(1, 1)] == "requirements: spark and merge"
    assert got[(1, 2)] == "also sort"
    assert got[(1, 3)] == "education: table stuff"
    assert got[(2, 0)] == "spark table spark"
    # repeated punctuation never yields empty sentences; indexes stay dense
    assert [got[(3, i)] for i in range(4)] == ["one", "two", "three", "spark"]


def test_keyword_sections_nearest_preceding_heading(spark, toy):
    got = {
        (r.doc_id, r.term): r.section
        for r in sentops.keyword_sections(spark, toy, CFG).collect()
    }
    # doc 1: spark/merge first occur after 'requirements:', sort also
    # inside the requirements segment, table after 'education:'
    assert got[(1, "spark")] == "requirements"
    assert got[(1, "merge")] == "requirements"
    assert got[(1, "sort")] == "requirements"
    assert got[(1, "table")] == "education"
    # doc 2 has no headings → general
    assert got[(2, "spark")] == "general"
    assert got[(2, "table")] == "general"
    assert got[(3, "spark")] == "general"


def test_context_window_validation(spark, toy):
    got = {
        (r.doc_id, r.term): (r.first_sent, r.n_context_other, r.valid)
        for r in sentops.context_validated_terms(spark, toy, CFG).collect()
    }
    # doc 1: 'spark' first in sentence 1; window [0..2] holds merge+sort
    assert got[(1, "spark")] == (1, 2, True)
    # 'table' first in sentence 3; window [2..4] holds only sort (sent 2)
    assert got[(1, "table")] == (3, 1, True)
    # doc 2: one sentence; spark×2 + table — others for spark = 1 (table),
    # others for table = 2 (the two sparks)
    assert got[(2, "spark")] == (0, 1, True)
    assert got[(2, "table")] == (0, 2, True)
    # doc 3: spark alone in its window → invalid
    assert got[(3, "spark")] == (3, 0, False)


def test_window_size_zero_restricts_to_own_sentence(spark, toy):
    got = {
        (r.doc_id, r.term): (r.n_context_other, r.valid)
        for r in sentops.context_validated_terms(
            spark, toy, CFG, window=0
        ).collect()
    }
    # doc 1 'spark' sentence 1 contains merge → 1 other
    assert got[(1, "spark")] == (1, True)
    # doc 1 'sort' alone in sentence 2 → invalid at w=0
    assert got[(1, "sort")] == (0, False)
