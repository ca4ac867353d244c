"""Query-string parser unit tests + executor semantics pins.

The full engine-vs-DuckDB value parity of `query_string_search` is
covered by tests/test_driver_contract.py (registry-wide); these pin
the parser grammar and the Lucene BooleanQuery candidate algebra on a
tiny in-memory corpus where expected hits are hand-checkable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from keywords4cv_spark.query.parse import (
    FUZZY_MAX_DIST,
    Clause,
    parse_query,
    search_query_strings,
)


def test_parse_occurs_and_kinds():
    cs = parse_query('merge +join -slow +"table scan" mer* qurey~ "aa bb cc"~2')
    assert cs == [
        Clause("should", "term", ("merge",)),
        Clause("must", "term", ("join",)),
        Clause("must_not", "term", ("slow",)),
        Clause("must", "phrase", ("table", "scan")),
        Clause("should", "prefix", ("mer",)),
        Clause("should", "fuzzy", ("qurey",)),
        Clause("should", "phrase", ("aa", "bb", "cc"), slop=2),
    ]


def test_parse_normalization_and_degenerate():
    # terms fold through the engine tokenizer
    assert parse_query("MeRgE")[0].terms == ("merge",)
    # multi-token bare word (punct split) becomes an exact phrase
    assert parse_query("foo-bar")[0] == Clause("should", "phrase", ("foo", "bar"))
    # single-token quoted phrase degrades to a term clause
    assert parse_query('"merge"')[0].kind == "term"
    # fuzzy distance suffix, capped at the Lucene max of 2
    assert parse_query("query~1")[0].dist == 1
    assert parse_query("query~9")[0].dist == FUZZY_MAX_DIST
    # degenerate inputs parse to nothing
    assert parse_query('"" * ~ + -') == []


def test_executor_boolean_algebra(spark):
    docs = spark.createDataFrame(
        [
            (1, "merge join fast", "en"),
            (2, "merge only here", "en"),
            (3, "join slow merge", "en"),
            (4, "table scan merge join", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = search_query_strings(
        spark, docs, [(0, "merge +join -slow"), (1, '+"table scan"')]
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    # q0: must 'join' → {1,3,4}; not 'slow' drops 3 → {1,4}, scored
    assert sorted(r.doc_id for r in by_q[0]) == [1, 4]
    assert all(r.score > 0 for r in by_q[0])
    # q1: phrase-only must → doc 4, constant-score 0.0
    assert [(r.doc_id, r.score) for r in by_q[1]] == [(4, 0.0)]


def test_executor_expansion_and_empty(spark):
    docs = spark.createDataFrame(
        [
            (1, "merge table mergesort", "en"),
            (2, "stream window", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = search_query_strings(
        spark, docs, [(0, "mer*"), (1, "tble~"), (2, "zzznope")]
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert sorted(r.doc_id for r in by_q[0]) == [1]  # merge + mergesort
    assert sorted(r.doc_id for r in by_q[1]) == [1]  # tble~ → table
    assert 2 not in by_q  # absent term → no candidates


def test_indexed_executor_rank_identical(spark, sf_dir):
    """The index-backed executor must reproduce the oracle-gated
    index-free path exactly — same candidates, ranks and round(·,6)
    scores — on the full gated query-string set (every construct:
    must/should/not literals, must-phrase, prefix, fuzzy, sloppy
    phrase, absent term)."""
    from keywords4cv_spark.driver_queries import (
        _QS_QUERIES,
        _docs,
        _index_for,
        _pos_index_for,
    )
    from keywords4cv_spark.query.parse import search_query_strings_indexed

    index, icfg = _index_for(spark, sf_dir)
    pos_index = _pos_index_for(spark, sf_dir)
    want = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 6))
        for r in search_query_strings(
            spark, _docs(spark, sf_dir), _QS_QUERIES, icfg
        ).collect()
    }
    got = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 6))
        for r in search_query_strings_indexed(
            spark, index, pos_index, _QS_QUERIES, icfg
        ).collect()
    }
    assert want  # non-degenerate
    assert got == want


def test_search_with_snippets_windows_exact(spark, sf_dir):
    """search_with_snippets = indexed retrieval + best-window
    highlighting. The decode+picker path is verified against a pure
    Python recomputation over the raw tokenized text: for every hit,
    the window [s, s+width) starting at a highlight-term position with
    the most DISTINCT highlight terms, smallest start on ties; hits of
    queries with no scoring terms (phrase-only) keep null snippets."""
    from keywords4cv_spark.driver_queries import (
        _QS_QUERIES,
        _docs,
        _index_for,
        _pos_index_for,
    )
    from keywords4cv_spark.query.parse import (
        MUST_NOT,
        _clause_terms,
        parse_query,
        search_with_snippets,
    )
    from keywords4cv_spark.textprep.normalize import tokenize

    index, icfg = _index_for(spark, sf_dir)
    pos_index = _pos_index_for(spark, sf_dir)
    width = 8
    out = search_with_snippets(
        spark, index, pos_index, _QS_QUERIES, icfg, width=width
    ).collect()
    assert out
    assert {r.query_id for r in out} >= {0, 1, 2, 3, 4}

    parsed = {qid: parse_query(s) for qid, s in _QS_QUERIES}
    cterm = _clause_terms(
        spark, index.dictionary.select("term", "term_id", "df"), parsed, 64, 16
    )
    hl: dict[int, set[str]] = {}
    for r in cterm.filter(F.col("occur") != MUST_NOT).collect():
        hl.setdefault(r.query_id, set()).add(r.term)

    texts = {
        r.doc_id: tokenize(r.text)
        for r in _docs(spark, sf_dir).filter(F.col("lang") == "en").collect()
    }
    for r in out:
        terms = hl.get(r.query_id, set())
        toks = texts[r.doc_id]
        occ = [(p, t) for p, t in enumerate(toks) if t in terms]
        if not occ:
            assert r.win_start is None and r.n_terms is None, r
            continue
        best_s, best_n = -1, -1
        for s, _ in occ:
            n = len({t for p, t in occ if s <= p < s + width})
            if n > best_n:
                best_s, best_n = s, n
        assert (r.win_start, r.n_terms) == (best_s, best_n), (r, best_s, best_n)


def test_parse_filters_ranges_boosts():
    assert parse_query("source:src1")[0] == Clause(
        "must", "filter", ("src1",), field="source"
    )
    assert parse_query("-source:src0")[0] == Clause(
        "must_not", "filter", ("src0",), field="source"
    )
    assert parse_query("n_chars:[200 TO 400]")[0] == Clause(
        "must", "range", (), field="n_chars", lo=200.0, hi=400.0
    )
    assert parse_query("n_chars:[* TO 400]")[0].lo is None
    assert parse_query("merge^2.5")[0].boost == 2.5
    assert parse_query("mer*^3")[0] == Clause(
        "should", "prefix", ("mer",), boost=3.0
    )
    assert parse_query("qurey~^2")[0].kind == "fuzzy"
    assert parse_query('"table scan"^2')[0].boost == 2.0
    # a '+' filter stays filter-context MUST; boost on plain term default 1
    assert parse_query("+source:src1")[0].occur == "must"
    assert parse_query("merge")[0].boost == 1.0


_EXT_QUERIES = [
    (0, "source:src1"),                   # filter-only → constant score 0
    (1, "merge source:src1"),             # filter + should: msm drops to 0
    (2, "+join -source:src0"),            # termlike must + negative filter
    (3, "n_chars:[200 TO 400] merge^2"),  # numeric range + boosted should
    (4, "merge^3 join"),                  # boost reweights the BM25 sum
    (5, "m?rge"),                         # single-char wildcard
    (6, "*ream^2 join"),                  # leading-star wildcard + boost
    (7, "+s*eam -source:src0"),           # wildcard as MUST + neg filter
    (8, "/m[ae]rge/"),                    # regexp, char class
    (9, "/st(r|d)eam/^2 join"),           # regexp, alternation + boost
    (10, "+/jo.n/ -source:src0"),         # regexp as MUST + neg filter
]


def test_parse_wildcards():
    assert parse_query("m?rge")[0] == Clause("should", "wildcard", ("m?rge",))
    assert parse_query("*ream^2")[0] == Clause(
        "should", "wildcard", ("*ream",), boost=2.0
    )
    # internal star + trailing star is wildcard, not prefix; ** collapses
    assert parse_query("s*eam**")[0] == Clause("should", "wildcard", ("s*eam*",))
    # simple trailing star stays a (range-prunable) prefix clause
    assert parse_query("mer*")[0].kind == "prefix"
    # literal segments fold through the tokenizer; pure wildcards drop
    assert parse_query("M?RGE")[0].terms == ("m?rge",)
    assert parse_query("*") == []
    assert parse_query("?*") == []
    assert parse_query("-st?eam")[0].occur == "must_not"


def test_parse_regexp():
    from keywords4cv_spark.query.parse import _regexp_literal_prefix

    assert parse_query("/m[ae]rge/")[0] == Clause(
        "should", "regexp", ("m[ae]rge",)
    )
    assert parse_query("/st(r|d)eam/^2")[0] == Clause(
        "should", "regexp", ("st(r|d)eam",), boost=2.0
    )
    assert parse_query("-/jo.n/")[0].occur == "must_not"
    assert parse_query("+/jo.n/")[0].occur == "must"
    # malformed, empty, and match-all patterns drop
    assert parse_query("/[a-/") == []
    assert parse_query("//") == []
    assert parse_query("/.*/") == []
    # a URL-shaped bare token is NOT a regexp clause (no leading slash;
    # it parses as a field filter, Lucene's reading of `http:...`)
    assert parse_query("http://foo/bar")[0].kind == "filter"
    # pruning prefix: literal run, stopped at the first metachar; the
    # last literal is excluded under a may-match-zero quantifier
    assert _regexp_literal_prefix("merg(e|es)") == "merg"
    assert _regexp_literal_prefix("ab*c") == "a"
    assert _regexp_literal_prefix("ab+c") == "ab"
    assert _regexp_literal_prefix("ab?c") == "a"
    assert _regexp_literal_prefix(".*x") == ""
    assert _regexp_literal_prefix("m[ae]rge") == "m"


def test_extended_grammar_matches_generated_oracle(spark, sf_dir):
    """The oracle generator covers the FULL grammar (boost, filter,
    range): the index-free executor and the generated DuckDB SQL must
    agree value-level on a query set exercising every extension."""
    import duckdb

    from test_driver_contract import _assert_frames_match

    from keywords4cv_spark.driver_queries import _TF_CTES, _docs
    from keywords4cv_spark.query.parse import query_string_oracle

    got = search_query_strings(
        spark, _docs(spark, sf_dir), _EXT_QUERIES
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(query_string_oracle(_EXT_QUERIES, _TF_CTES)).fetchdf()
    assert len(got) > 0
    _assert_frames_match("extended_grammar", got, want)


def test_extended_grammar_indexed_rank_identical(spark, sf_dir):
    """tf-path ↔ indexed-path rank identity for filter/range/boost
    clauses; the indexed path takes the doc-attribute relation
    explicitly (docmeta carries no source/n_chars — attributes are the
    doc-values analog, a pruned scan of the source table)."""
    from keywords4cv_spark.driver_queries import (
        _docs,
        _index_for,
        _pos_index_for,
    )
    from keywords4cv_spark.query.parse import search_query_strings_indexed

    index, icfg = _index_for(spark, sf_dir)
    pos_index = _pos_index_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    attrs = docs.filter(F.col("lang") == "en").select(
        "doc_id", "source", "n_chars"
    )
    want = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 6))
        for r in search_query_strings(spark, docs, _EXT_QUERIES, icfg).collect()
    }
    got = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 6))
        for r in search_query_strings_indexed(
            spark, index, pos_index, _EXT_QUERIES, icfg, doc_attrs=attrs
        ).collect()
    }
    assert want
    assert got == want


def test_wand_fast_path_routing_and_identity(spark, sf_dir):
    """Pure-disjunctive query strings route to Block-Max WAND (unit:
    eligibility predicate) and stay rank-identical to the index-free
    executor across boosts and dictionary expansions."""
    from keywords4cv_spark.driver_queries import (
        _docs,
        _index_for,
        _pos_index_for,
    )
    from keywords4cv_spark.query.parse import (
        search_query_strings_indexed,
        wand_eligible_qids,
    )

    qs = [
        (0, "merge join"),          # plain disjunction
        (1, "mer* stream^2"),       # prefix expansion + boost
        (2, "spark^3 qurey~"),      # boost + fuzzy expansion
        (3, "zzznope"),             # absent term → empty
        (4, "st?eam m*ge^2"),       # wildcard expansions
        (5, "/m[ae]rge/ stream"),   # regexp expansion
    ]
    parsed = {qid: parse_query(s) for qid, s in qs}
    assert wand_eligible_qids(parsed) == [0, 1, 2, 3, 4, 5]
    # ineligible shapes: must, not, phrase, filter
    for bad in ["+merge join", "merge -slow", '"merge join"', "source:src1 merge"]:
        assert wand_eligible_qids({9: parse_query(bad)}) == []

    index, icfg = _index_for(spark, sf_dir)
    pos_index = _pos_index_for(spark, sf_dir)
    want = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 6))
        for r in search_query_strings(spark, _docs(spark, sf_dir), qs, icfg).collect()
    }
    got = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 6))
        for r in search_query_strings_indexed(
            spark, index, pos_index, qs, icfg
        ).collect()
    }
    assert want
    assert got == want


def test_explain_query_strings_decomposes_scores(spark, sf_dir):
    """explain rows reconstruct each hit's score: per-(hit, term)
    boosted contributions sum to the ranked score (within the
    round(·,6) convention), boosts surface verbatim, and phrase-only
    hits (constant score 0) explain as zero rows."""
    from keywords4cv_spark.driver_queries import (
        _QS_QUERIES,
        _index_for,
        _pos_index_for,
    )
    from keywords4cv_spark.query.parse import (
        explain_query_strings,
        search_query_strings_indexed,
    )

    index, icfg = _index_for(spark, sf_dir)
    pos_index = _pos_index_for(spark, sf_dir)
    qs = _QS_QUERIES + [(10, "merge^3 join")]
    hits = search_query_strings_indexed(
        spark, index, pos_index, qs, icfg
    ).collect()
    rows = explain_query_strings(spark, index, pos_index, qs, icfg).collect()
    assert rows

    by_hit: dict[tuple[int, int], list] = {}
    for r in rows:
        by_hit.setdefault((r.query_id, r.doc_id), []).append(r)
    for h in hits:
        parts = by_hit.get((h.query_id, h.doc_id), [])
        if h.score == 0.0:
            assert parts == [], (h, parts)
            continue
        assert parts, h
        assert abs(sum(p.contribution for p in parts) - h.score) < 1e-4, h
        assert all(p.rank == h.rank for p in parts)
    # the boosted query's 'merge' rows carry boost 3.0
    boosted = [r for r in rows if r.query_id == 10 and r.term == "merge"]
    assert boosted and all(r.boost == 3.0 for r in boosted)


def test_parse_query_never_raises_fuzz():
    """The search front door must never 500: parse_query handles ANY
    user string — unbalanced quotes/slashes, stray operators, malformed
    ranges/regexps — by dropping what it can't read, never raising.
    Every surviving clause is structurally valid."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    kinds = {
        "term", "phrase", "prefix", "wildcard", "regexp", "fuzzy",
        "filter", "range",
    }
    occurs = {"should", "must", "must_not"}

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(codec="ascii"),
            max_size=60,
        )
    )
    def _check(q: str) -> None:
        clauses = parse_query(q)
        for c in clauses:
            assert c.kind in kinds
            assert c.occur in occurs
            if c.kind not in ("filter", "range"):
                assert c.terms and all(isinstance(t, str) for t in c.terms)
            assert c.boost >= 0.0

    _check()


def test_regexp_prefix_pruning_is_sound_fuzz():
    """The literal-prefix pushdown must never prune a true match:
    for any pattern built from the supported subset and any term, if
    the anchored pattern full-matches the term then the term starts
    with `_regexp_literal_prefix(pattern)` — the invariant that makes
    the StartsWith conjunct a pure optimization."""
    import re as _re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from keywords4cv_spark.query.parse import _regexp_literal_prefix

    atom = st.one_of(
        st.text(alphabet="abcdxyz", min_size=1, max_size=3),
        st.sampled_from(["[ab]", "[a-d]", ".", "(a|b)", "(merge|join)"]),
    )
    piece = st.tuples(atom, st.sampled_from(["", "*", "+", "?", "{1,2}"])).map(
        lambda t: t[0] + t[1]
    )
    concat = st.lists(piece, min_size=1, max_size=4).map("".join)
    # top-level unescaped alternation — the case where any non-empty
    # prefix is unsound (merge|join matches "join…")
    patterns = st.one_of(
        concat,
        st.tuples(concat, concat).map(lambda t: t[0] + "|" + t[1]),
    )
    terms = st.text(alphabet="abcdxyz", max_size=10)

    @settings(max_examples=500, deadline=None)
    @given(patterns, terms)
    def _check(pat: str, term: str) -> None:
        try:
            rx = _re.compile(pat)
        except _re.error:
            return
        pre = _regexp_literal_prefix(pat)
        if rx.fullmatch(term):
            assert term.startswith(pre), (pat, pre, term)

    _check()


def test_phrase_scoring_counts_occurrences(spark):
    """Opt-in phrase-frequency scoring: BM25 over the occurrence count
    (distinct chain END positions). Two docs of equal length, one with
    the phrase twice, one once → the double-occurrence doc ranks first
    with a strictly higher score; a non-adjacent doc only matches (and
    scores) once slop allows the gap. Default stays constant-score 0."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta xx", "en"),
            (2, "alpha beta zz yy ww", "en"),
            (3, "alpha zz beta yy ww", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = search_query_strings(
        spark, docs, [(0, '"alpha beta"')], score_phrases=True
    ).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert set(by_doc) == {1, 2}
    assert by_doc[1].rank == 1 and by_doc[2].rank == 2
    assert by_doc[1].score > by_doc[2].score > 0.0

    # slop=1 admits the gapped doc 3, at the lowest score (ptf 1, dl 5)
    rows = search_query_strings(
        spark, docs, [(0, '"alpha beta"~1')], score_phrases=True
    ).collect()
    assert {r.doc_id for r in rows} == {1, 2, 3}
    assert all(r.score > 0.0 for r in rows)

    # default: filter-only phrases, constant score 0 (the gated shape)
    rows = search_query_strings(spark, docs, [(0, '"alpha beta"')]).collect()
    assert {r.doc_id for r in rows} == {1, 2}
    assert all(r.score == 0.0 for r in rows)


_PH_QUERIES = [
    (0, '"data column" merge'),      # should phrase + should term
    (1, '+"table scan"^2 join'),     # boosted must phrase + should term
    (2, '"data column query"~2'),    # sloppy phrase only
    (3, '"table scan" -stream'),     # phrase + must_not term
    (4, "merge join"),               # control: no phrase clause
]


def test_phrase_scoring_matches_generated_oracle(spark, sf_dir):
    """Engine (index-free, score_phrases=True) vs the generated DuckDB
    oracle (score_phrases=True): value-level agreement across must /
    should / boosted / sloppy phrase clauses on the gate corpus."""
    import duckdb

    from test_driver_contract import _assert_frames_match

    from keywords4cv_spark.driver_queries import _TF_CTES, _docs
    from keywords4cv_spark.query.parse import query_string_oracle

    got = search_query_strings(
        spark, _docs(spark, sf_dir), _PH_QUERIES, score_phrases=True
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(
        query_string_oracle(_PH_QUERIES, _TF_CTES, score_phrases=True)
    ).fetchdf()
    assert len(got) > 0
    # phrase scoring must actually engage: scored phrase-only hits
    assert (got[got.query_id == 2].score > 0).any()
    _assert_frames_match("phrase_scoring", got, want)


def test_phrase_scoring_indexed_rank_identical(spark, sf_dir):
    """Indexed executor with score_phrases=True (proximity_search
    n_occurrences feeding BM25) reproduces the index-free path exactly
    — ranks and round(·,6) scores."""
    from keywords4cv_spark.driver_queries import (
        _docs,
        _index_for,
        _pos_index_for,
    )
    from keywords4cv_spark.query.parse import search_query_strings_indexed

    index, icfg = _index_for(spark, sf_dir)
    pos_index = _pos_index_for(spark, sf_dir)
    want = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 6))
        for r in search_query_strings(
            spark, _docs(spark, sf_dir), _PH_QUERIES, icfg, score_phrases=True
        ).collect()
    }
    got = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 6))
        for r in search_query_strings_indexed(
            spark, index, pos_index, _PH_QUERIES, icfg, score_phrases=True
        ).collect()
    }
    assert want
    assert got == want


def test_explain_includes_scored_phrases(spark, sf_dir):
    """With score_phrases, explain rows cover phrase clauses too (term
    = the phrase string, tf = occurrence count) and the per-hit
    contribution sum still reconstructs the ranked score exactly."""
    from keywords4cv_spark.driver_queries import _index_for, _pos_index_for
    from keywords4cv_spark.query.parse import (
        explain_query_strings,
        search_query_strings_indexed,
    )

    index, icfg = _index_for(spark, sf_dir)
    pos_index = _pos_index_for(spark, sf_dir)
    hits = search_query_strings_indexed(
        spark, index, pos_index, _PH_QUERIES, icfg, score_phrases=True
    ).collect()
    rows = explain_query_strings(
        spark, index, pos_index, _PH_QUERIES, icfg, score_phrases=True
    ).collect()
    assert rows
    # phrase rows surface with multi-word terms and positive tf
    prows = [r for r in rows if " " in r.term]
    assert prows and all(r.tf >= 1 for r in prows)

    by_hit: dict[tuple[int, int], list] = {}
    for r in rows:
        by_hit.setdefault((r.query_id, r.doc_id), []).append(r)
    for h in hits:
        parts = by_hit.get((h.query_id, h.doc_id), [])
        if h.score == 0.0:
            assert parts == [], (h, parts)
            continue
        assert parts, h
        assert abs(sum(p.contribution for p in parts) - h.score) < 1e-4, h


def test_min_should_match(spark):
    """Lucene minimumShouldMatch: candidacy requires >= msm distinct
    should clauses (on top of musts); scoring is untouched for the
    docs that survive; an unsatisfiable threshold matches nothing."""
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd", "en"),
            (2, "aa xx yy zz", "en"),
            (3, "aa bb xx yy", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    q = [(0, "aa bb cc")]
    base = {
        r.doc_id: r.score
        for r in search_query_strings(spark, docs, q).collect()
    }
    assert set(base) == {1, 2, 3}
    for msm, expect in [(2, {1, 3}), (3, {1}), (4, set())]:
        rows = search_query_strings(
            spark, docs, q, min_should_match=msm
        ).collect()
        assert {r.doc_id for r in rows} == expect, msm
        # survivors keep their unfiltered scores: candidacy only
        assert all(r.score == base[r.doc_id] for r in rows), msm
    # msm applies ON TOP of musts: must 'aa' AND >= 2 of the shoulds
    rows = search_query_strings(
        spark, docs, [(0, "+aa bb cc dd")], min_should_match=2
    ).collect()
    assert {r.doc_id for r in rows} == {1}
    # Lucene MatchNoDocs rewrite: a must-only query (ZERO should
    # clauses) under msm > 0 matches nothing — msm exceeds the
    # optional-clause count
    rows = search_query_strings(
        spark, docs, [(0, "+aa")], min_should_match=2
    ).collect()
    assert rows == []


_MSM_QUERIES = [
    (0, "merge join stream"),        # should-only, msm prunes
    (1, "+data merge join"),         # must + shoulds, msm on top
    (2, "mer* join"),                # expansion counts as one clause
    (3, "merge"),                    # fewer shoulds than msm → empty
    (4, "+data"),                    # must-only, ZERO shoulds → MatchNoDocs
]


def test_min_should_match_matches_generated_oracle(spark, sf_dir):
    import duckdb

    from test_driver_contract import _assert_frames_match

    from keywords4cv_spark.driver_queries import _TF_CTES, _docs
    from keywords4cv_spark.query.parse import query_string_oracle

    got = search_query_strings(
        spark, _docs(spark, sf_dir), _MSM_QUERIES, min_should_match=2
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(
        query_string_oracle(_MSM_QUERIES, _TF_CTES, min_should_match=2)
    ).fetchdf()
    assert len(got) > 0
    assert not (got.query_id == 3).any()  # unsatisfiable → no rows
    assert not (got.query_id == 4).any()  # must-only + msm → MatchNoDocs
    _assert_frames_match("min_should_match", got, want)


def test_min_should_match_indexed_rank_identical(spark, sf_dir):
    """Indexed executor under msm=2 (WAND fast path bypassed — WAND
    answers the msm<=1 disjunction) reproduces the index-free path."""
    from keywords4cv_spark.driver_queries import (
        _docs,
        _index_for,
        _pos_index_for,
    )
    from keywords4cv_spark.query.parse import search_query_strings_indexed

    index, icfg = _index_for(spark, sf_dir)
    pos_index = _pos_index_for(spark, sf_dir)
    want = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 6))
        for r in search_query_strings(
            spark, _docs(spark, sf_dir), _MSM_QUERIES, icfg, min_should_match=2
        ).collect()
    }
    got = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 6))
        for r in search_query_strings_indexed(
            spark, index, pos_index, _MSM_QUERIES, icfg, min_should_match=2
        ).collect()
    }
    assert want
    assert got == want
