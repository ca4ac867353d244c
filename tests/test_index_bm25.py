"""Index build + BM25 rank-identity + checkpoint/resume (SURVEY.md §5.2 c,e)."""

from __future__ import annotations

import math
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from keywords4cv_spark.config import EngineConfig
from keywords4cv_spark.index.build import build_index, load_index
from keywords4cv_spark.query.bm25 import bm25_brute_force
from keywords4cv_spark.query.fixtures import QUERY_SET, query_terms
from keywords4cv_spark.query.wand import bm25_wand
from keywords4cv_spark.textprep.normalize import tokenize

CFG = EngineConfig(n_term_buckets=2, shuffle_partitions=8)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def index(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx"))
    return build_index(spark, docs, d, CFG, url_col="source")


def python_bm25_oracle(rows, k1=1.2, b=0.75, exclude=frozenset()):
    """Brute-force BM25 in pure Python over (doc_id, text) rows.

    ``exclude``: tombstoned doc_ids — never ranked, but still counted
    in n/avgdl/df (Lucene deleted-docs semantics, index/upsert.py)."""
    toks = {d: tokenize(t) for d, t in rows}
    dls = {d: len(ts) for d, ts in toks.items()}
    n = len(toks)
    avgdl = sum(dls.values()) / n
    df: dict[str, int] = {}
    tf: dict[tuple[int, str], int] = {}
    for d, ts in toks.items():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
        for t in ts:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    out = {}
    for qid, q in QUERY_SET:
        scores: dict[int, float] = {}
        for term in query_terms(q):
            if term not in df:
                continue
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for d in toks:
                f_ = tf.get((d, term))
                if not f_:
                    continue
                s = idf * (f_ * (k1 + 1)) / (f_ + k1 * (1 - b + b * dls[d] / avgdl))
                scores[d] = scores.get(d, 0.0) + s
        ranked = sorted(
            ((round(s, 6), -d) for d, s in scores.items() if d not in exclude),
            reverse=True,
        )[:10]
        out[qid] = [(i + 1, -nd, s) for i, (s, nd) in enumerate(ranked)]
    return out


def _collect(df):
    return {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in df.collect()
    }


def test_brute_force_matches_python_oracle(spark, docs):
    rows = [(r.doc_id, r.text) for r in docs.filter(F.col("lang") == "en").collect()]
    oracle = python_bm25_oracle(rows)
    got = _collect(bm25_brute_force(spark, docs, CFG))
    want = {
        (qid, rank): (doc, pytest.approx(score, abs=1e-6))
        for qid, hits in oracle.items()
        for rank, doc, score in hits
    }
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0], key
        assert got[key][1] == want[key][1], key


def test_index_tables_sane(index):
    dict_rows = index.dictionary.count()
    assert dict_rows > 0
    # term_ids dense 1..V and unique
    agg = index.dictionary.agg(
        F.min("term_id"), F.max("term_id"), F.countDistinct("term_id")
    ).collect()[0]
    assert agg[0] == 1 and agg[1] == dict_rows and agg[2] == dict_rows
    # postings cover exactly cf occurrences: sum(n) per term == df
    per_term = index.postings.groupBy("term_id").agg(F.sum("n").alias("n"))
    joined = per_term.join(index.dictionary, "term_id").filter(
        F.col("n") != F.col("df")
    )
    assert joined.count() == 0
    # lineage complete for all buckets
    assert index.lineage.filter(F.col("status") == "complete").count() == CFG.n_term_buckets


def test_wand_rank_identical_to_brute_force(spark, docs, index):
    brute = _collect(bm25_brute_force(spark, docs, CFG))
    wand = _collect(bm25_wand(spark, index, CFG))
    assert set(brute) == set(wand)
    for key in brute:
        assert brute[key][0] == wand[key][0], (key, brute[key], wand[key])
        assert abs(brute[key][1] - wand[key][1]) < 1e-9, key


def test_wand_daat_loop_rank_identical(spark, docs, index, monkeypatch):
    """Force the document-at-a-time heap loop (the at-scale path) by
    zeroing the vectorized-scorer gate: it must stay rank-identical to
    the default (vectorized) path and to brute force."""
    from keywords4cv_spark.query import wand as wand_mod

    monkeypatch.setattr(wand_mod, "TAAT_MAX_POSTINGS", 0)
    daat = _collect(bm25_wand(spark, index, CFG))
    brute = _collect(bm25_brute_force(spark, docs, CFG))
    assert set(brute) == set(daat)
    for key in brute:
        assert brute[key][0] == daat[key][0], (key, brute[key], daat[key])


def test_wand_many_random_queries(spark, docs, index):
    """Randomized single+multi term queries: WAND == brute force on all."""
    rng = np.random.default_rng(7)
    vocab = [r.term for r in index.dictionary.select("term").collect()]
    queries = []
    for qid in range(30):
        n_terms = int(rng.integers(1, 5))
        terms = rng.choice(vocab, size=n_terms, replace=False)
        queries.append((qid, " ".join(terms)))
    pairs = [(qid, t) for qid, q in queries for t in dict.fromkeys(q.split())]
    brute = _collect(bm25_brute_force(spark, docs, CFG, queries=pairs))
    wand = _collect(bm25_wand(spark, index, CFG, queries=pairs))
    assert brute.keys() == wand.keys()
    for key in brute:
        assert brute[key][0] == wand[key][0], (key, brute[key], wand[key])


def test_salted_index_rank_identical(spark, docs, tmp_path):
    """Doc-band segmentation (SURVEY.md §4.2.1 / VERDICT r1 #6): head
    terms of the Zipf corpus must span >1 segment — so a query touching
    them fans out to >1 (query, band) task — and the rank-merged WAND
    result must stay rank-identical to brute force."""
    cfg = EngineConfig(
        n_term_buckets=2, shuffle_partitions=8, n_salts=4
    )
    idx = build_index(spark, docs, str(tmp_path / "salted"), cfg, url_col="source")
    # the Zipf head term "the" appears in most docs → all 4 doc bands
    head_id = [
        r["term_id"] for r in idx.dictionary.filter(F.col("term") == "the").collect()
    ][0]
    head_segments = (
        idx.postings.filter(F.col("term_id") == head_id)
        .select("segment").distinct().count()
    )
    assert head_segments == cfg.n_salts, "head term does not span all doc bands"
    brute = _collect(bm25_brute_force(spark, docs, cfg))
    wand = _collect(bm25_wand(spark, idx, cfg))
    assert set(brute) == set(wand)
    for key in brute:
        assert brute[key][0] == wand[key][0], (key, brute[key], wand[key])


def test_resume_skips_completed_buckets(spark, docs, tmp_path):
    """Kill-and-resume: a crash mid-build leaves bucket 0 committed
    (postings + lineage, both _SUCCESS-marked) and bucket 1 gone; resume
    must rebuild ONLY bucket 1 — bucket 0's lineage row (and its
    finished_ts) must survive untouched."""
    d1, d2 = str(tmp_path / "full"), str(tmp_path / "resumed")
    full = build_index(spark, docs, d1, CFG, url_col="source")
    build_index(spark, docs, d2, CFG, url_col="source")
    ts_before = {
        int(r["bucket"]): float(r["finished_ts"])
        for r in load_index(spark, d2).lineage.collect()
    }
    shutil.rmtree(f"{d2}/postings/bucket=1")  # bucket 1 never committed
    shutil.rmtree(f"{d2}/_lineage/bucket=1")
    resumed = build_index(spark, docs, d2, CFG, resume=True, url_col="source")
    lineage = {
        int(r["bucket"]): float(r["finished_ts"]) for r in resumed.lineage.collect()
    }
    assert sorted(lineage) == list(range(CFG.n_term_buckets))
    assert lineage[0] == ts_before[0], "bucket 0 was rebuilt despite a valid hash"
    assert lineage[1] != ts_before[1]
    a = full.postings.select("term_id", "segment", "block_id", "first_doc", "n", "max_tf")
    b = resumed.postings.select("term_id", "segment", "block_id", "first_doc", "n", "max_tf")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_resume_rebuilds_on_corpus_change(spark, docs, tmp_path):
    """Verified resume (reference verify-then-load checkpoint gate): if
    the source corpus changed since the checkpoint, committed buckets'
    input_hash no longer matches and the build must rebuild rather than
    silently mix generations — including dictionary/docmeta/stats."""
    d = str(tmp_path / "changing")
    build_index(spark, docs, d, CFG, url_col="source")
    changed = docs.filter(F.col("doc_id") % 7 != 3)  # drop some docs
    resumed = build_index(spark, changed, d, CFG, resume=True, url_col="source")
    fresh_dir = str(tmp_path / "fresh")
    fresh = build_index(spark, changed, fresh_dir, CFG, url_col="source")
    cols = ["term_id", "segment", "block_id", "first_doc", "n", "max_tf"]
    a, b = resumed.postings.select(cols), fresh.postings.select(cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    da = resumed.dictionary.select("term", "term_id", "df", "cf")
    db = fresh.dictionary.select("term", "term_id", "df", "cf")
    assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0
    assert resumed.stats_row()["n_docs"] == fresh.stats_row()["n_docs"]


def test_empty_corpus_raises_cleanly(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="corpus is empty"):
        build_index(
            spark, docs.filter(F.col("doc_id") < 0), str(tmp_path / "e"), CFG,
            url_col="source",
        )


def test_compaction_equals_full_rebuild(spark, docs, tmp_path):
    """Block-level compaction of two generations must produce byte-level
    the same postings as one full build over the union: same n_salts →
    identical (term, band) runs; deterministic term ids → identical
    block splits, bounds and payloads."""
    from keywords4cv_spark.index.compact import compact_generations

    gen1 = build_index(
        spark, docs.filter(F.col("doc_id") % 2 == 0), str(tmp_path / "cg1"), CFG,
        url_col="source",
    )
    gen2 = build_index(
        spark, docs.filter(F.col("doc_id") % 2 == 1), str(tmp_path / "cg2"), CFG,
        url_col="source",
    )
    compacted = compact_generations(spark, [gen1, gen2], str(tmp_path / "cmp"), CFG)
    full = build_index(spark, docs, str(tmp_path / "cfull"), CFG, url_col="source")
    cols = [
        "term_id", "segment", "block_id", "first_doc", "last_doc",
        "n", "max_tf", "max_score", "payload",
    ]
    a, b = compacted.postings.select(cols), full.postings.select(cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    da = compacted.dictionary.select("term", "term_id", "df", "cf")
    db = full.dictionary.select("term", "term_id", "df", "cf")
    assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0
    assert compacted.stats_row()["n_docs"] == full.stats_row()["n_docs"]
    # and the compacted index answers queries rank-identically
    brute = _collect(bm25_brute_force(spark, docs, CFG))
    wand = _collect(bm25_wand(spark, compacted, CFG))
    assert set(brute) == set(wand)
    for key in brute:
        assert brute[key][0] == wand[key][0], (key, brute[key], wand[key])


def test_compaction_mixed_band_layouts(spark, docs, tmp_path):
    """Generations built with DIFFERENT n_salts still compact correctly:
    a doc's band is constant across its own generation's terms, so
    (term, segment) merge groups and query-time (query, segment) groups
    remain valid doc partitions even when the band modulus differs."""
    from keywords4cv_spark.index.compact import compact_generations

    g1 = build_index(
        spark, docs.filter(F.col("doc_id") % 2 == 0), str(tmp_path / "m1"),
        EngineConfig(n_term_buckets=2, n_salts=2, shuffle_partitions=8),
        url_col="source",
    )
    g2 = build_index(
        spark, docs.filter(F.col("doc_id") % 2 == 1), str(tmp_path / "m2"),
        EngineConfig(n_term_buckets=2, n_salts=4, shuffle_partitions=8),
        url_col="source",
    )
    compacted = compact_generations(spark, [g1, g2], str(tmp_path / "mc"), CFG)
    brute = _collect(bm25_brute_force(spark, docs, CFG))
    wand = _collect(bm25_wand(spark, compacted, CFG))
    assert set(brute) == set(wand)
    for key in brute:
        assert brute[key][0] == wand[key][0], (key, brute[key], wand[key])
        assert abs(brute[key][1] - wand[key][1]) < 1e-9, key
    # multi-generation querying over mixed layouts is exact too
    from keywords4cv_spark.query.wand import bm25_wand_multi

    multi = _collect(bm25_wand_multi(spark, [g1, g2], CFG))
    assert set(brute) == set(multi)
    for key in brute:
        assert brute[key][0] == multi[key][0], key


def test_positional_compaction_preserves_phrase_search(spark, docs, tmp_path):
    """VERDICT r2 #4: positional generations must compact (the guard that
    refused them is gone). Block-level merge of two positional
    generations must yield byte-identical postings to a positional full
    rebuild, AND answer phrase queries identically; mixing positional
    with non-positional generations still refuses."""
    from keywords4cv_spark.index.compact import compact_generations
    from keywords4cv_spark.query.phrase import phrase_search

    pcfg = EngineConfig(
        n_term_buckets=2, n_salts=2, shuffle_partitions=8, store_positions=True
    )
    g1 = build_index(
        spark, docs.filter(F.col("doc_id") % 2 == 0), str(tmp_path / "p1"), pcfg,
        url_col="source",
    )
    g2 = build_index(
        spark, docs.filter(F.col("doc_id") % 2 == 1), str(tmp_path / "p2"), pcfg,
        url_col="source",
    )
    compacted = compact_generations(spark, [g1, g2], str(tmp_path / "pc"), pcfg)
    assert bool(compacted.stats_row()["store_positions"])
    full = build_index(spark, docs, str(tmp_path / "pf"), pcfg, url_col="source")
    cols = [
        "term_id", "segment", "block_id", "first_doc", "last_doc",
        "n", "max_tf", "max_score", "payload",
    ]
    a, b = compacted.postings.select(cols), full.postings.select(cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    phrases = ["merge join", "the data", "table scan"]
    want = {
        (r.phrase, r.doc_id): r.n_occurrences
        for r in phrase_search(spark, full, phrases).collect()
    }
    got = {
        (r.phrase, r.doc_id): r.n_occurrences
        for r in phrase_search(spark, compacted, phrases).collect()
    }
    assert got == want and len(got) > 0
    # mixed positional/non-positional generations refuse loudly
    g3 = build_index(
        spark, docs.filter(F.col("doc_id") % 2 == 1), str(tmp_path / "np2"),
        EngineConfig(n_term_buckets=2, n_salts=2, shuffle_partitions=8),
        url_col="source",
    )
    with pytest.raises(ValueError, match="positional"):
        compact_generations(spark, [g1, g3], str(tmp_path / "bad"), pcfg)


def test_multi_generation_rank_identical(spark, docs, tmp_path):
    """Incremental story: two disjoint-generation indexes queried together
    must be rank-identical to brute force over the union (and therefore
    to a full rebuild)."""
    from keywords4cv_spark.query.wand import bm25_wand_multi

    gen1 = build_index(
        spark, docs.filter(F.col("doc_id") % 2 == 0), str(tmp_path / "g1"), CFG,
        url_col="source",
    )
    gen2 = build_index(
        spark, docs.filter(F.col("doc_id") % 2 == 1), str(tmp_path / "g2"), CFG,
        url_col="source",
    )
    brute = _collect(bm25_brute_force(spark, docs, CFG))
    multi = _collect(bm25_wand_multi(spark, [gen1, gen2], CFG))
    assert set(brute) == set(multi)
    for key in brute:
        assert brute[key][0] == multi[key][0], (key, brute[key], multi[key])
        assert abs(brute[key][1] - multi[key][1]) < 1e-9, key


def test_generation_manifest_snapshots(spark, docs, tmp_path):
    """Metadata-driven generation discovery (Iceberg-snapshot analog):
    appends commit whole manifest versions, the highest committed
    version wins, uncommitted versions are invisible, re-appending a
    path is a no-op, and the loaded generations answer rank-identically
    through bm25_wand_multi."""
    import os

    from keywords4cv_spark.index.manifest import (
        append_generation,
        current_manifest,
        load_generations,
    )
    from keywords4cv_spark.query.wand import bm25_wand_multi

    fam = str(tmp_path / "family")
    g1 = str(tmp_path / "g1")
    g2 = str(tmp_path / "g2")
    build_index(spark, docs.filter(F.col("doc_id") % 2 == 0), g1, CFG,
                url_col="source")
    build_index(spark, docs.filter(F.col("doc_id") % 2 == 1), g2, CFG,
                url_col="source")
    assert current_manifest(spark, fam) is None
    append_generation(spark, fam, g1)
    m1 = current_manifest(spark, fam).collect()
    assert [r["gen_id"] for r in m1] == [0]
    append_generation(spark, fam, g2)
    m2 = current_manifest(spark, fam).collect()
    assert sorted(r["gen_id"] for r in m2) == [0, 1]
    # re-append is a no-op (no new version, no duplicate record)
    append_generation(spark, fam, g2)
    assert sorted(r["gen_id"] for r in current_manifest(spark, fam).collect()) == [0, 1]
    # an uncommitted (crashed) version is invisible to readers
    os.makedirs(os.path.join(fam, "_manifest", "v=99"), exist_ok=True)
    assert sorted(r["gen_id"] for r in current_manifest(spark, fam).collect()) == [0, 1]
    gens = load_generations(spark, fam)
    assert len(gens) == 2
    brute = _collect(bm25_brute_force(spark, docs, CFG))
    multi = _collect(bm25_wand_multi(spark, gens, CFG))
    assert set(brute) == set(multi)
    for key in brute:
        assert brute[key][0] == multi[key][0], key


def _recrawl_split(docs, mod=5, off=1_000_000,
                   suffix=" refreshed crawl snapshot content"):
    """(base_with_url, recrawled): every ``mod``-th doc re-crawled with a
    new doc_id, the SAME synthesized per-doc url, and refreshed text."""
    base = docs.withColumn(
        "url", F.concat_ws("/", F.col("source"), F.col("doc_id"))
    )
    recrawled = (
        base.filter(F.col("doc_id") % mod == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(off))
        .withColumn("text", F.concat(F.col("text"), F.lit(suffix)))
    )
    return base, recrawled


def test_recrawl_upsert_and_purging_compaction(spark, docs, tmp_path):
    """Recrawl upsert end-to-end (index/upsert.py):
    (a) superseded_docs tombstones exactly the stale originals of
        re-crawled urls;
    (b) bm25_wand_multi(exclude=) drops them from every result while
        scoring with UNION statistics (Lucene deleted-docs semantics —
        checked against the python oracle over the union corpus);
    (c) the purging compaction equals a fresh build over the live corpus
        byte-for-byte and answers rank-identically with NO exclusion."""
    from keywords4cv_spark.index.compact import compact_generations
    from keywords4cv_spark.index.upsert import superseded_docs
    from keywords4cv_spark.query.wand import bm25_wand_multi

    MOD = 5
    base, recrawled = _recrawl_split(docs, mod=MOD)
    g0 = build_index(spark, base, str(tmp_path / "u0"), CFG, url_col="url")
    g1 = build_index(spark, recrawled, str(tmp_path / "u1"), CFG, url_col="url")
    gens = [g0, g1]

    # (a) tombstones = the en originals of re-crawled urls, nothing else
    tombs = {r.doc_id for r in superseded_docs(gens).collect()}
    expected = {
        r.doc_id
        for r in base.filter(
            (F.col("doc_id") % MOD == 0) & (F.col("lang") == "en")
        ).select("doc_id").collect()
    }
    assert tombs == expected and len(tombs) > 0

    # (b) query-time exclusion with stale union statistics
    union_rows = [
        (r.doc_id, r.text)
        for df_ in (base, recrawled)
        for r in df_.filter(F.col("lang") == "en").select("doc_id", "text").collect()
    ]
    oracle = python_bm25_oracle(union_rows, exclude=tombs)
    want = {
        (qid, rank): (doc, pytest.approx(score, abs=1e-6))
        for qid, hits in oracle.items()
        for rank, doc, score in hits
    }
    got = _collect(
        bm25_wand_multi(spark, gens, CFG, exclude=superseded_docs(gens))
    )
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0], key
        assert got[key][1] == want[key][1], key
    # the scenario is non-vacuous: without exclusion a stale doc ranks
    plain = _collect(bm25_wand_multi(spark, gens, CFG))
    assert any(doc in tombs for doc, _ in plain.values())

    # (c) purging compaction == fresh build over the live corpus
    live = base.filter(F.col("doc_id") % MOD != 0).unionByName(recrawled)
    purged = compact_generations(
        spark, gens, str(tmp_path / "up"), CFG, superseded=superseded_docs(gens)
    )
    fresh = build_index(spark, live, str(tmp_path / "uf"), CFG, url_col="url")
    cols = [
        "term_id", "segment", "block_id", "first_doc", "last_doc",
        "n", "max_tf", "max_score", "payload",
    ]
    a, b = purged.postings.select(cols), fresh.postings.select(cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert purged.stats_row()["n_docs"] == fresh.stats_row()["n_docs"]
    assert purged.stats_row()["sum_dl"] == fresh.stats_row()["sum_dl"]
    brute = _collect(bm25_brute_force(spark, live, CFG))
    wand = _collect(bm25_wand(spark, purged, CFG))
    assert set(brute) == set(wand)
    for key in brute:
        assert brute[key][0] == wand[key][0], (key, brute[key], wand[key])
        assert abs(brute[key][1] - wand[key][1]) < 1e-9, key


def test_purging_compaction_positional(spark, docs, tmp_path):
    """Purging merge carries position payloads: the purged index equals
    a fresh positional build over the live corpus and answers phrase
    queries identically (no stale doc ever matches a phrase)."""
    from keywords4cv_spark.index.compact import compact_generations
    from keywords4cv_spark.index.upsert import superseded_docs
    from keywords4cv_spark.query.phrase import phrase_search

    pcfg = EngineConfig(
        n_term_buckets=2, n_salts=2, shuffle_partitions=8, store_positions=True
    )
    base, recrawled = _recrawl_split(docs)
    g0 = build_index(spark, base, str(tmp_path / "pp0"), pcfg, url_col="url")
    g1 = build_index(spark, recrawled, str(tmp_path / "pp1"), pcfg, url_col="url")
    purged = compact_generations(
        spark, [g0, g1], str(tmp_path / "ppc"), pcfg,
        superseded=superseded_docs([g0, g1]),
    )
    assert bool(purged.stats_row()["store_positions"])
    live = base.filter(F.col("doc_id") % 5 != 0).unionByName(recrawled)
    fresh = build_index(spark, live, str(tmp_path / "ppf"), pcfg, url_col="url")
    cols = [
        "term_id", "segment", "block_id", "first_doc", "last_doc",
        "n", "max_tf", "max_score", "payload",
    ]
    a, b = purged.postings.select(cols), fresh.postings.select(cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    phrases = ["merge join", "the data", "table scan"]
    want = {
        (r.phrase, r.doc_id): r.n_occurrences
        for r in phrase_search(spark, fresh, phrases).collect()
    }
    got = {
        (r.phrase, r.doc_id): r.n_occurrences
        for r in phrase_search(spark, purged, phrases).collect()
    }
    assert got == want and len(got) > 0


def test_snippet_windows_match_text_scan(spark, docs, tmp_path):
    """Snippet windows computed from positional postings must equal a
    brute-force text-scan twin: same best (start, distinct-term count)
    per (query, top-k hit) under the (most terms, earliest start) rule."""
    from keywords4cv_spark.query.snippets import snippet_windows

    pcfg = EngineConfig(
        n_term_buckets=2, n_salts=2, shuffle_partitions=8, store_positions=True
    )
    idx = build_index(spark, docs, str(tmp_path / "sn"), pcfg, url_col="source")
    width = 8
    got = {
        (r.query_id, r.doc_id): (r.win_start, r.n_terms)
        for r in snippet_windows(spark, idx, pcfg, width=width).collect()
    }
    # text-scan twin over the same top-k hits
    texts = {
        r.doc_id: tokenize(r.text)
        for r in docs.filter(F.col("lang") == "en").collect()
    }
    hits = _collect(bm25_wand(spark, idx, pcfg))
    assert set(got) == {(q, d) for (q, _), (d, _) in hits.items()}
    qterms = {qid: set(query_terms(q)) for qid, q in QUERY_SET}
    for (qid, doc), (start, n) in got.items():
        toks = texts[doc]
        pos = [
            (p, t) for p, t in enumerate(toks) if t in qterms[qid]
        ]
        best = (-1, -1)
        for s, _ in pos:
            cnt = len({t for p, t in pos if s <= p < s + width})
            if cnt > best[1]:
                best = (s, cnt)
        assert (start, n) == best, (qid, doc, (start, n), best)
        assert 1 <= n <= len(qterms[qid])


def test_proximity_search_semantics(spark, docs, tmp_path):
    """proximity_search: slop=0 must equal phrase_search's adjacency
    counts; slop>0 must match a brute-force reachability twin over the
    tokenized text (distinct chain END positions), including a 3-term
    phrase where greedy chaining would be wrong."""
    from keywords4cv_spark.query.phrase import phrase_search, proximity_search

    pcfg = EngineConfig(
        n_term_buckets=2, n_salts=2, shuffle_partitions=8, store_positions=True
    )
    idx = build_index(spark, docs, str(tmp_path / "px"), pcfg, url_col="source")
    phrases = ["merge join", "the data", "table scan", "data column query"]

    def brute(slop):
        gap = 1 + slop
        out = {}
        for r in docs.filter(F.col("lang") == "en").collect():
            toks = tokenize(r.text)
            for ph in phrases:
                terms = tokenize(ph)
                reach = {i for i, t in enumerate(toks) if t == terms[0]}
                for t in terms[1:]:
                    reach = {
                        q for q, tok in enumerate(toks)
                        if tok == t and any(p < q <= p + gap for p in reach)
                    }
                if reach:
                    out[(ph, r.doc_id)] = len(reach)
        return out

    for slop in (0, 2):
        got = {
            (r.phrase, r.doc_id): r.n_occurrences
            for r in proximity_search(spark, idx, phrases, slop=slop).collect()
        }
        assert got == brute(slop), f"slop={slop}"
    exact = {
        (r.phrase, r.doc_id): r.n_occurrences
        for r in phrase_search(spark, idx, phrases).collect()
    }
    prox0 = {
        (r.phrase, r.doc_id): r.n_occurrences
        for r in proximity_search(spark, idx, phrases, slop=0).collect()
    }
    assert prox0 == exact


def test_search_after_pages_reconstruct_full_ranking(spark, docs, index):
    """Cursor pagination: concatenating successive search-after pages
    must reproduce the one-shot deep top-k exactly (same docs, same
    order), for several page hops."""
    PAGE, PAGES = 5, 4
    deep = bm25_wand(spark, index, CFG, k=PAGE * PAGES)
    want = {
        (r.query_id, r.rank): (r.doc_id, r.score) for r in deep.collect()
    }
    got = {}
    cursors = {}
    active = None  # all queries on page 1
    for page in range(PAGES):
        from keywords4cv_spark.query.fixtures import query_term_pairs

        pairs = (
            None
            if active is None
            else [(q, t) for q, t in query_term_pairs() if q in active]
        )
        rows = bm25_wand(
            spark, index, CFG, k=PAGE, queries=pairs,
            after=cursors if cursors else None,
        ).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
            got[(r.query_id, page * PAGE + r.rank)] = (r.doc_id, r.score)
        cursors = {
            qid: (float(rs[-1].score), int(rs[-1].doc_id))
            for qid, rs in (
                (qid, sorted(rs, key=lambda r: r.rank)) for qid, rs in by_q.items()
            )
            if len(rs) == PAGE
        }
        active = set(cursors)
        if not active:
            break
    assert got == want


def test_superseded_docs_within_generation_dup(spark, docs, tmp_path):
    """A url crawled twice in the SAME batch: the winner-per-url rule
    (max(gen_seq, doc_id)) keeps the newest capture (highest doc_id)
    and tombstones the earlier one — no cross-generation recrawl
    needed."""
    from keywords4cv_spark.index.upsert import superseded_docs

    base = docs.withColumn(
        "url", F.concat_ws("/", F.col("source"), F.col("doc_id"))
    )
    # duplicate the first 3 en docs into the same batch with new doc_ids
    dups = (
        base.filter(F.col("lang") == "en").orderBy("doc_id").limit(3)
        .withColumn("doc_id", F.col("doc_id") + F.lit(500_000))
    )
    batch = base.unionByName(dups)
    g = build_index(spark, batch, str(tmp_path / "wg"), CFG, url_col="url")
    tombs = {r.doc_id for r in superseded_docs([g]).collect()}
    originals = {
        r.doc_id for r in base.filter(F.col("lang") == "en")
        .orderBy("doc_id").limit(3).collect()
    }
    assert tombs == originals


def test_manifest_compaction_lineage_and_fencing(spark, docs, tmp_path):
    """VERDICT r3 next #8: the manifest survives a compact-then-append
    sequence — record_compaction removes the replaced generations from
    the current snapshot, records which gen_ids the compacted tree
    subsumed (lineage), and a later append coexists with the compacted
    record; multi-generation retrieval through the manifest stays
    rank-identical to brute force throughout. Plus the writer fence: a
    version dir committed out from under an appender raises instead of
    silently dropping a record."""
    import os

    from keywords4cv_spark.index.compact import compact_generations
    from keywords4cv_spark.index.manifest import (
        append_generation,
        current_manifest,
        load_generations,
        record_compaction,
    )
    from keywords4cv_spark.query.wand import bm25_wand_multi

    fam = str(tmp_path / "family")
    thirds = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for i in (0, 1):
        build_index(spark, thirds[i], str(tmp_path / f"g{i}"), CFG,
                    url_col="source")
        append_generation(spark, fam, str(tmp_path / f"g{i}"))
    gens = load_generations(spark, fam)
    compacted_dir = str(tmp_path / "compacted")
    compact_generations(spark, gens, compacted_dir, CFG)
    record_compaction(spark, fam, compacted_dir, [0, 1])
    recs = {r["gen_id"]: r.asDict() for r in current_manifest(spark, fam).collect()}
    assert set(recs) == {2}
    assert recs[2]["replaces"] == "0,1"
    assert recs[2]["schema_fp"]
    # append a third generation AFTER compaction
    build_index(spark, thirds[2], str(tmp_path / "g2"), CFG, url_col="source")
    append_generation(spark, fam, str(tmp_path / "g2"))
    recs = {r["gen_id"]: r.asDict() for r in current_manifest(spark, fam).collect()}
    assert set(recs) == {2, 3}
    assert recs[3]["replaces"] == ""
    assert recs[3]["schema_fp"] == recs[2]["schema_fp"]
    brute = _collect(bm25_brute_force(spark, docs, CFG))
    multi = _collect(bm25_wand_multi(spark, load_generations(spark, fam), CFG))
    assert set(brute) == set(multi)
    for key in brute:
        assert brute[key][0] == multi[key][0], key
        assert abs(brute[key][1] - multi[key][1]) < 1e-9, key
    # writer fence: steal the next version number, then try to append
    versions = sorted(
        int(d.split("=")[1]) for d in os.listdir(os.path.join(fam, "_manifest"))
        if d.startswith("v=")
    )
    stolen = os.path.join(fam, "_manifest", f"v={versions[-1] + 1}")
    os.makedirs(stolen)
    with open(os.path.join(stolen, "marker"), "w") as f:
        f.write("concurrent writer")
    build_index(spark, docs.filter(F.col("lang") == "en").limit(5),
                str(tmp_path / "g3"), CFG, url_col="source")
    with pytest.raises(RuntimeError, match="committed concurrently"):
        append_generation(spark, fam, str(tmp_path / "g3"))


def test_manifest_time_travel(spark, docs, tmp_path):
    """Snapshot time travel (Iceberg VERSION AS OF analog): earlier
    manifest versions stay readable after later appends AND after a
    compaction that logically removed generations — a reader pinned to
    the pre-compaction version still sees (and can query) the original
    generation set, rank-identically."""
    from keywords4cv_spark.index.compact import compact_generations
    from keywords4cv_spark.index.manifest import (
        append_generation,
        load_generations,
        manifest_at,
        record_compaction,
    )
    from keywords4cv_spark.query.wand import bm25_wand_multi

    fam = str(tmp_path / "family")
    halves = [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]
    for i in (0, 1):
        build_index(spark, halves[i], str(tmp_path / f"g{i}"), CFG,
                    url_col="source")
        append_generation(spark, fam, str(tmp_path / f"g{i}"))
    gens_v1 = load_generations(spark, fam)
    compacted = str(tmp_path / "compacted")
    compact_generations(spark, gens_v1, compacted, CFG)
    record_compaction(spark, fam, compacted, [0, 1])
    # v=0: one generation; v=1: two; v=2 (current): the compacted tree
    assert [r["gen_id"] for r in manifest_at(spark, fam, 0).collect()] == [0]
    assert sorted(r["gen_id"] for r in manifest_at(spark, fam, 1).collect()) == [0, 1]
    assert [r["replaces"] for r in manifest_at(spark, fam, 2).collect()] == ["0,1"]
    with pytest.raises(ValueError, match="no committed manifest version"):
        manifest_at(spark, fam, 7)
    # the pre-compaction snapshot still answers, rank-identical to now
    old_gens = load_generations(spark, fam, version=1)
    assert len(old_gens) == 2
    brute = _collect(bm25_brute_force(spark, docs, CFG))
    then = _collect(bm25_wand_multi(spark, old_gens, CFG))
    now = _collect(bm25_wand_multi(spark, load_generations(spark, fam), CFG))
    assert set(brute) == set(then) == set(now)
    for key in brute:
        assert brute[key][0] == then[key][0] == now[key][0], key


def test_expire_snapshots_gc(spark, docs, tmp_path):
    """expire_snapshots (Iceberg analog): old manifest versions drop,
    index trees referenced only by expired versions are reclaimed,
    retained snapshots (and the current query path) keep working."""
    import os

    from keywords4cv_spark.index.compact import compact_generations
    from keywords4cv_spark.index.manifest import (
        append_generation,
        expire_snapshots,
        load_generations,
        manifest_at,
        record_compaction,
    )
    from keywords4cv_spark.query.wand import bm25_wand_multi

    fam = str(tmp_path / "family")
    halves = [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]
    g = [str(tmp_path / f"g{i}") for i in range(2)]
    for i in (0, 1):
        build_index(spark, halves[i], g[i], CFG, url_col="source")
        append_generation(spark, fam, g[i])
    compacted = str(tmp_path / "compacted")
    compact_generations(spark, load_generations(spark, fam), compacted, CFG)
    record_compaction(spark, fam, compacted, [0, 1])  # v=2
    # nothing to expire when history fits the window
    assert expire_snapshots(spark, fam, keep_last=3) == {
        "expired_versions": [], "removed_trees": []}
    out = expire_snapshots(spark, fam, keep_last=1)
    assert out["expired_versions"] == [0, 1]
    # g0/g1 only referenced by expired versions → reclaimed; compacted kept
    assert sorted(out["removed_trees"]) == sorted(
        os.path.abspath(p) for p in g)
    assert not os.path.exists(g[0]) and not os.path.exists(g[1])
    assert os.path.exists(compacted)
    with pytest.raises(ValueError, match="no committed manifest version"):
        manifest_at(spark, fam, 1)
    # the retained snapshot still answers, rank-identical to brute force
    brute = _collect(bm25_brute_force(spark, docs, CFG))
    now = _collect(bm25_wand_multi(spark, load_generations(spark, fam), CFG))
    assert set(brute) == set(now)
    for key in brute:
        assert brute[key][0] == now[key][0], key


def test_fused_tf_matches_classic_path(spark, docs):
    """term_frequencies_fused (tokenize+count in one Arrow pass, zero
    shuffle) must emit the exact relation the classic explode + groupBy
    path produces — rows, dtypes, and ascending positions included."""
    from keywords4cv_spark.index.build import (
        term_frequencies,
        term_frequencies_fused,
        tokenized_docs,
    )

    for wp in (False, True):
        cfg = EngineConfig(store_positions=wp)
        classic = term_frequencies(tokenized_docs(docs, cfg), with_positions=wp)
        fused = term_frequencies_fused(docs, cfg, with_positions=wp)
        # nullability flags differ (agg outputs are non-null by
        # construction); names + types are the contract
        shape = lambda df: [  # noqa: E731
            (f.name, f.dataType.simpleString()) for f in df.schema.fields
        ]
        assert shape(fused) == shape(classic), (fused.schema, classic.schema)
        n_c, n_f = classic.count(), fused.count()
        assert n_c == n_f, (n_c, n_f)
        assert fused.exceptAll(classic).count() == 0
        assert classic.exceptAll(fused).count() == 0


def test_fused_tf_has_no_shuffle(spark, docs):
    """The fused tf plan is scan → mapInPandas: any Exchange here means
    the row-local aggregation regressed to a corpus-sized shuffle."""
    from keywords4cv_spark.index.build import term_frequencies_fused
    from keywords4cv_spark.plans.inspect import explain_str, without_aqe

    with without_aqe(spark):
        plan = explain_str(term_frequencies_fused(docs, EngineConfig()), mode="simple")
    assert "Exchange" not in plan, plan


def test_fused_build_fingerprint_matches_classic(spark, docs, tmp_path):
    """Whole-corpus input_hash is computed from (term, doc_id, tf) — a
    fused and a classic build over the same corpus must agree on it,
    which pins the entire tf relation byte-for-byte."""
    cfg_f = EngineConfig(n_term_buckets=2, shuffle_partitions=8, tokenizer="pandas")
    cfg_c = EngineConfig(n_term_buckets=2, shuffle_partitions=8, tokenizer="jvm")
    ix_f = build_index(spark, docs, str(tmp_path / "f"), cfg_f, url_col="source")
    ix_c = build_index(spark, docs, str(tmp_path / "c"), cfg_c, url_col="source")
    hf = int(ix_f.stats.collect()[0]["input_hash"])
    hc = int(ix_c.stats.collect()[0]["input_hash"])
    assert hf == hc, (hf, hc)
