"""Block-Max WAND top-k over the compressed posting index.

The north-star operator (BASELINE.json north_rule): document-at-a-time
top-k with two pruning levels —

- WAND pivoting on per-list global max contribution, and
- block-max skipping: the current block's upper bound refines the
  global bound, and doc ranges whose block bounds can't beat the heap
  threshold are jumped without decoding any payload.

Spark shape: query terms ⋈ dictionary (broadcast) → postings filtered
by term_id (file/bucket-pruned; at cluster scale the postings table is
laid out by term bucket so only matching files are scanned) →
``groupBy(query_id, segment).applyInPandas(bmw)`` → rank-merge.

Segments are DOC BANDS (segment = doc_id % n_salts at build time, the
same partition of the doc space for every term), so the (query, band)
groups are independent exact WAND problems: a doc's postings for all
query terms share one band. Each band emits its local top-k; the
global top-k is a subset of the union (fewer than k docs beat a global
top-k doc overall, hence within its band), so rank_topk over the
union of partials is EXACT. This keeps a Zipf head term ("the") from
funneling a query's whole block set into one Arrow task — query-time
parallelism is n_salts × n_queries (VERDICT r1 #6).

Rank-identity vs the brute-force scorer (and the DuckDB oracle): the
final ordering everywhere is (round(score, 6) DESC, doc_id ASC). The
heap uses exactly that key, and pruning keeps a 1e-6 margin below the
k-th rounded score so a candidate that would tie after rounding (and
win on doc_id) is never skipped.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from keywords4cv_spark.config import DEFAULT_CONFIG, EngineConfig
from keywords4cv_spark.session import local_rows
from keywords4cv_spark.index.build import IndexTables
from keywords4cv_spark.index.codec import bm25_contrib, decode_block
from keywords4cv_spark.query.bm25 import SCORE_DECIMALS, rank_topk
from keywords4cv_spark.query.fixtures import TOP_K, query_term_pairs

# prune margin: half-ulp of round(.,6) plus float-noise headroom
MARGIN = 10.0 ** (-SCORE_DECIMALS) + 1e-9
EXHAUSTED = np.iinfo(np.int64).max


class _Cursor:
    """One posting run (term, segment): block-level skips, lazy decode."""

    __slots__ = (
        "idf", "k1", "b", "avgdl", "first", "last", "maxs", "payloads", "ns",
        "nblocks", "bi", "docs", "tfs", "dls", "cur_doc", "decoded_pos",
        "global_ub",
    )

    def __init__(self, idf, k1, b, avgdl, first, last, maxs, payloads, ns):
        order = np.argsort(first, kind="stable")
        self.idf, self.k1, self.b, self.avgdl = idf, k1, b, avgdl
        self.first, self.last, self.maxs = first[order], last[order], maxs[order]
        self.payloads = [payloads[i] for i in order]
        self.ns = ns[order]
        self.nblocks = len(self.payloads)
        self.bi = 0
        self.docs = self.tfs = self.dls = None
        self.decoded_pos = -1
        self.global_ub = float(self.maxs.max()) if self.nblocks else 0.0
        self.cur_doc = int(self.first[0]) if self.nblocks else EXHAUSTED

    def exhausted(self) -> bool:
        return self.cur_doc == EXHAUSTED

    def block_ub(self) -> float:
        return float(self.maxs[self.bi]) if self.bi < self.nblocks else 0.0

    def block_last(self) -> int:
        return int(self.last[self.bi]) if self.bi < self.nblocks else EXHAUSTED

    def _enter_block(self, bi: int):
        self.bi = bi
        self.docs = self.tfs = self.dls = None
        self.decoded_pos = -1

    def _decode(self):
        if self.docs is None:
            self.docs, self.tfs, self.dls = decode_block(
                self.payloads[self.bi], int(self.ns[self.bi]), int(self.first[self.bi])
            )

    def next_geq(self, target: int):
        """Advance to the first posting with doc >= target.

        Whole-block skips never decode; only landing inside a block
        decodes its payload. cur_doc may be a *shallow* bound (the
        block's first_doc) when the block hasn't been entered yet —
        that is exact, since first_doc is a real posting.
        """
        if self.cur_doc >= target:
            return
        bi = self.bi
        while bi < self.nblocks and self.last[bi] < target:
            bi += 1
        if bi != self.bi:
            self._enter_block(bi)
        if bi >= self.nblocks:
            self.cur_doc = EXHAUSTED
            return
        if target <= self.first[bi]:
            self.cur_doc = int(self.first[bi])
            return
        self._decode()
        idx = int(np.searchsorted(self.docs, target, side="left"))
        # last[bi] >= target guarantees idx is in range
        self.decoded_pos = idx
        self.cur_doc = int(self.docs[idx])

    def score_current(self) -> float:
        """Exact BM25 contribution at cur_doc (decodes current block)."""
        self._decode()
        if self.decoded_pos < 0 or self.docs[self.decoded_pos] != self.cur_doc:
            self.decoded_pos = int(np.searchsorted(self.docs, self.cur_doc, side="left"))
        i = self.decoded_pos
        return float(
            bm25_contrib(
                self.tfs[i : i + 1], self.dls[i : i + 1],
                self.idf, self.k1, self.b, self.avgdl,
            )[0]
        )

    def advance(self):
        self.next_geq(self.cur_doc + 1)


def _single_cursor_topk(
    c: _Cursor, k: int, excluded: frozenset[int]
) -> list[tuple[int, float]]:
    """Vectorized top-k for a one-term (query, band) group.

    The DAAT pivot loop degenerates to a per-posting Python iteration
    when there is a single list — ~30 µs/posting, which for a Zipf head
    term is the whole cost of the scoring stage. Here blocks are
    processed in DESCENDING block-max order with numpy decode+score
    (C speed), and once k candidates are banked every remaining block
    whose max can't beat the k-th rounded score (minus the usual
    rounding margin) is skipped without decoding — the same block-max
    pruning, battery-powered by argsort instead of a heap. Returns a
    small SUPERSET of the band top-k near the rounding boundary
    (2·MARGIN slack, covering the half-even-vs-half-up gap between
    numpy and Spark rounding); rank_topk applies the exact final
    ordering and cut."""
    if not c.nblocks:
        return []
    order = np.argsort(-c.maxs, kind="stable")
    doc_parts: list[np.ndarray] = []
    score_parts: list[np.ndarray] = []
    banked = 0
    theta = -np.inf
    for bi in order:
        if float(c.maxs[bi]) < theta:
            break
        docs, tfs, dls = decode_block(
            c.payloads[bi], int(c.ns[bi]), int(c.first[bi])
        )
        s = bm25_contrib(tfs, dls, c.idf, c.k1, c.b, c.avgdl)
        if excluded:
            keep = np.array([d not in excluded for d in docs], dtype=bool)
            docs, s = docs[keep], s[keep]
        if not docs.size:
            continue
        doc_parts.append(docs)
        score_parts.append(s)
        banked += docs.size
        if banked >= k:
            all_s = np.concatenate(score_parts)
            rk = float(np.partition(np.round(all_s, SCORE_DECIMALS), -k)[-k])
            theta = rk - 2.0 * MARGIN
    if not doc_parts:
        return []
    docs = np.concatenate(doc_parts)
    s = np.concatenate(score_parts)
    r = np.round(s, SCORE_DECIMALS)
    if docs.size > k:
        rk = float(np.partition(r, -k)[-k])
        keep = r >= rk - 2.0 * MARGIN
        docs, s = docs[keep], s[keep]
    return [(int(d), float(x)) for d, x in zip(docs, s)]


# per-(query, band) posting-count gate for the vectorized exact scorer:
# below it, decoding every block and aggregating per doc in numpy is
# cheaper than document-at-a-time pivoting in Python (~30 µs/candidate);
# above it, WAND's doc-aligned pruning repays the loop by skipping most
# block decodes. Scale-adaptive by construction — the gate is on the
# GROUP's postings, so web-scale head-term bands keep the pruning path.
TAAT_MAX_POSTINGS = 1_000_000


def _taat_topk(
    cursors: list[_Cursor], k: int, excluded: frozenset[int]
) -> list[tuple[int, float]]:
    """Vectorized exact scoring for a small multi-list group: decode all
    blocks, per-doc sum via factorized scatter-add, top-k cut with the
    same 2·MARGIN rounding-boundary slack as _single_cursor_topk (the
    returned rows are a small superset near the boundary; rank_topk
    applies the exact final ordering)."""
    doc_parts: list[np.ndarray] = []
    score_parts: list[np.ndarray] = []
    for c in cursors:
        for bi in range(c.nblocks):
            docs, tfs, dls = decode_block(
                c.payloads[bi], int(c.ns[bi]), int(c.first[bi])
            )
            doc_parts.append(docs)
            score_parts.append(
                bm25_contrib(tfs, dls, c.idf, c.k1, c.b, c.avgdl)
            )
    if not doc_parts:
        return []
    docs = np.concatenate(doc_parts)
    s = np.concatenate(score_parts)
    uniq, inv = np.unique(docs, return_inverse=True)
    agg = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(agg, inv, s)
    if excluded:
        keep = np.array([d not in excluded for d in uniq], dtype=bool)
        uniq, agg = uniq[keep], agg[keep]
    if not uniq.size:
        return []
    r = np.round(agg, SCORE_DECIMALS)
    if uniq.size > k:
        rk = float(np.partition(r, -k)[-k])
        keep = r >= rk - 2.0 * MARGIN
        uniq, agg = uniq[keep], agg[keep]
    return [(int(d), float(x)) for d, x in zip(uniq, agg)]


def _bmw_one_query(
    cursors: list[_Cursor],
    k: int,
    excluded: frozenset[int] = frozenset(),
    after: tuple[float, int] | None = None,
) -> list[tuple[int, float]]:
    """Block-Max WAND → [(doc_id, exact_score)] of the top-k candidates.

    Heap key is (round(score, 6), -doc_id) — the exact final ordering —
    so the returned set IS the deterministic top-k.

    ``excluded`` are tombstoned docs (superseded recrawls — see
    index/upsert.py): they are never scored or pushed to the heap, and
    skipping them keeps every bound valid (exclusion only removes
    candidates; it can't raise any doc's score past an upper bound).

    ``after`` = (rounded_score, doc_id) search-after cursor: only docs
    ranked STRICTLY after it (key (round(score,6), -doc_id) below the
    cursor's) enter the heap. The threshold stays heap-based — page-2
    scores sit BELOW the cursor, so seeding θ at the cursor score would
    wrongly prune them; the cursor's payoff is a bounded heap per page
    (k, not page·k) regardless of depth, unlike offset pagination.
    """
    if after is None:
        if len(cursors) == 1:
            return _single_cursor_topk(cursors[0], k, excluded)
        if sum(int(c.ns.sum()) for c in cursors) <= TAAT_MAX_POSTINGS:
            return _taat_topk(cursors, k, excluded)
    heap: list[tuple[float, int]] = []
    after_key = (after[0], -after[1]) if after is not None else None

    def threshold() -> float:
        return heap[0][0] - MARGIN if len(heap) >= k else -np.inf

    live = sorted((c for c in cursors if not c.exhausted()), key=lambda c: c.cur_doc)
    while live:
        theta = threshold()
        # --- WAND pivot over global upper bounds ---
        acc = 0.0
        pivot_doc = -1
        for c in live:
            acc += c.global_ub
            if acc > theta:
                pivot_doc = c.cur_doc
                break
        if pivot_doc < 0:
            break  # even all lists together can't beat the threshold

        # --- align every list that could contain the pivot ---
        # (includes lists tied on cur_doc beyond the pivot index — omitting
        # them undercounts the bound and wrongly skips docs)
        for c in live:
            if c.cur_doc < pivot_doc:
                c.next_geq(pivot_doc)
        holders = [c for c in live if c.cur_doc == pivot_doc]
        if holders and pivot_doc in excluded:
            for c in holders:
                c.advance()
        elif holders:
            # block-max refinement: exact current-block bounds at the pivot
            block_acc = sum(c.block_ub() for c in holders)
            if block_acc > theta:
                score = sum(c.score_current() for c in holders)
                item = (round(score, SCORE_DECIMALS), -pivot_doc, score)
                if after_key is not None and item[:2] >= after_key:
                    pass  # at-or-before the cursor: belongs to earlier pages
                elif len(heap) < k:
                    heapq.heappush(heap, item)
                elif item[:2] > heap[0][:2]:
                    heapq.heapreplace(heap, item)
                for c in holders:
                    c.advance()
            else:
                # these blocks can't beat the threshold for ANY doc they
                # cover: jump to the nearest block boundary, clamped by the
                # first unaccounted list's cursor
                boundary = min(c.block_last() for c in holders) + 1
                others = [c.cur_doc for c in live if c.cur_doc > pivot_doc]
                nxt = min(others) if others else EXHAUSTED
                target = max(pivot_doc + 1, min(boundary, nxt))
                for c in holders:
                    c.next_geq(target)
        live = sorted((c for c in live if not c.exhausted()), key=lambda c: c.cur_doc)
    return [(-nd, exact) for _, nd, exact in heap]


def bm25_wand(
    spark: SparkSession,
    index: IndexTables,
    cfg: EngineConfig = DEFAULT_CONFIG,
    k: int = TOP_K,
    queries: list[tuple[int, str]] | list[tuple[int, str, float]] | None = None,
    after: dict[int, tuple[float, int]] | None = None,
) -> DataFrame:
    """BM25 top-k via Block-Max WAND; rank-identical to bm25_brute_force.

    ``queries`` rows may carry an optional third element: a per-term
    WEIGHT (query-time synonym/abbreviation expansion gives expanded
    terms a sub-1.0 weight). A weight w scales the term's contribution
    as w·idf — and the stored block-max bound is scaled by the same w,
    so WAND pruning stays exact at any positive weight.

    ``after``: per-query search-after cursor {query_id: (rounded_score,
    doc_id)} — returns the NEXT k results ranked strictly after the
    cursor. Cursor pagination keeps every page a k-sized heap problem
    (offset pagination at depth d needs a d·k heap). Queries absent
    from the dict paginate from the top as usual.
    """
    from keywords4cv_spark.deploy import ensure_py_files

    ensure_py_files(spark)
    pairs = queries if queries is not None else query_term_pairs()
    pairs3 = [
        (p[0], p[1], float(p[2]) if len(p) > 2 else 1.0) for p in pairs
    ]
    srow = index.stats_row()
    n_docs, avgdl = int(srow["n_docs"]), float(srow["avgdl"])
    k1, b = cfg.k1, cfg.b

    # driver-side memoized dictionary probe (IndexTables.lookup_terms):
    # replaces a per-call join + distinct().collect() pair with at most
    # one filter-pushdown job for never-seen terms — repeated batches
    # resolve term_id/df with zero jobs, and the bucket/term_id pruning
    # predicates below are known driver-side for free
    lut = index.lookup_terms([t for _, t, _ in pairs3])
    qrows = [
        (qid, lut[t][0], lut[t][1], w) for qid, t, w in pairs3 if t in lut
    ]
    if not qrows:
        return spark.createDataFrame([], "query_id long, rank int, doc_id long, score double")
    qterms = local_rows(
        spark, qrows, "query_id long, term_id long, df long, w double"
    )
    term_ids = sorted({tid for _, tid, _, _ in qrows})

    scan = index.postings
    if "bucket" in scan.columns and "n_term_buckets" in index.stats.columns:
        # bucket is the Hive-partition column of the postings layout →
        # this predicate prunes whole directories before any file is read
        nb = int(srow["n_term_buckets"])
        buckets = sorted({tid % nb for tid in term_ids})
        scan = scan.filter(F.col("bucket").isin(buckets))
    blocks = scan.filter(F.col("term_id").isin(term_ids)).join(
        F.broadcast(qterms), "term_id"
    )
    after_b = spark.sparkContext.broadcast(after or {})

    def bmw(pdf: pd.DataFrame) -> pd.DataFrame:
        # one (query, doc-band) group: segment is constant here, so each
        # term contributes exactly one cursor
        qid = int(pdf["query_id"].iloc[0])
        cursors = []
        for _, g in pdf.groupby("term_id", sort=True):
            df_val = int(g["df"].iloc[0])
            w = float(g["w"].iloc[0])
            idf = w * float(np.log(1.0 + (n_docs - df_val + 0.5) / (df_val + 0.5)))
            cursors.append(
                _Cursor(
                    idf, k1, b, avgdl,
                    g["first_doc"].to_numpy(np.int64),
                    g["last_doc"].to_numpy(np.int64),
                    # bound scales with the weight, keeping pruning exact
                    w * g["max_score"].to_numpy(np.float64),
                    list(g["payload"]),
                    g["n"].to_numpy(np.int64),
                )
            )
        hits = _bmw_one_query(cursors, k, after=after_b.value.get(qid))
        return pd.DataFrame(
            {
                "query_id": pd.Series([qid] * len(hits), dtype="int64"),
                "doc_id": pd.Series([d for d, _ in hits], dtype="int64"),
                "score": pd.Series([s for _, s in hits], dtype="float64"),
            }
        )

    # partial top-k per (query, doc band) — n_salts parallel tasks per
    # query — then an exact rank-merge of the small partials
    scored = blocks.groupBy("query_id", "segment").applyInPandas(
        bmw, "query_id long, doc_id long, score double"
    )
    return rank_topk(scored, k)


def _tf_upper_bound(max_tf: np.ndarray, idf: float, k1: float, b: float) -> np.ndarray:
    """Per-block BM25 upper bound from max_tf alone (dl → 0 limit).

    tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) is increasing in tf and
    decreasing in dl, so idf·max_tf·(k1+1)/(max_tf + k1·(1−b)) bounds
    every posting in the block. Looser than the stored exact block-max
    (which bakes in build-time global stats), but valid under ANY
    global stats — which is what multi-generation querying needs.
    """
    t = max_tf.astype(np.float64)
    return idf * (t * (k1 + 1.0)) / (t + k1 * (1.0 - b))


def bm25_wand_multi(
    spark: SparkSession,
    indexes: list[IndexTables],
    cfg: EngineConfig = DEFAULT_CONFIG,
    k: int = TOP_K,
    queries: list[tuple[int, str]] | None = None,
    exclude: DataFrame | None = None,
) -> DataFrame:
    """Rank-exact BM25 top-k across multiple index generations.

    The LSM-style incremental story: each crawl batch becomes its own
    small index (cheap append-only build over NEW docs); queries merge
    generations at read time — doc_id spaces are disjoint, df/N/avgdl
    combine exactly (sum_dl is stored as an integer), and per-block
    bounds are recomputed from max_tf because the baked max_score of an
    old generation is stale under the combined statistics. Results are
    rank-identical to a full rebuild over the union (tested).
    Compaction = build_index over the union when generations pile up.

    ``exclude``: optional (doc_id) DataFrame of tombstoned docs —
    superseded recrawl versions from ``index/upsert.py:superseded_docs``.
    Excluded docs are dropped from every result while statistics keep
    counting them (Lucene deleted-docs semantics; a purging compaction
    restores clean statistics). The tombstones travel as marker rows
    unioned into the block scan — partitioned to the same (query,
    doc-band) scoring tasks as the postings, never collected to the
    driver. All generations must share ``cfg.n_salts`` (the band rule
    ``doc_id % n_salts`` is how a tombstone finds its scoring task).
    """
    from keywords4cv_spark.deploy import ensure_py_files

    ensure_py_files(spark)
    pairs = queries if queries is not None else query_term_pairs()

    n_docs = 0
    sum_dl = 0
    for idx in indexes:
        srow = idx.stats_row()
        n_docs += int(srow["n_docs"])
        sum_dl += int(srow["sum_dl"])
    avgdl = sum_dl / n_docs
    k1, b = cfg.k1, cfg.b

    # global df per term = Σ generation df (doc spaces are disjoint).
    # Each generation's dictionary probe goes through its memoized
    # driver-side cache (IndexTables.lookup_terms) — the old plan paid
    # one join + distinct().collect() PER GENERATION per call
    df_total: dict[str, int] = {}
    gen_scans = []
    for g, idx in enumerate(indexes):
        lut = idx.lookup_terms([t for _, t in pairs])
        if not lut:
            continue
        for term, (_, df_val) in lut.items():
            df_total[term] = df_total.get(term, 0) + df_val
        term_ids = sorted({tid for tid, _ in lut.values()})
        qt_rows = [(qid, t, lut[t][0]) for qid, t in pairs if t in lut]
        qt = local_rows(
            spark, qt_rows, "query_id long, term string, term_id long"
        )
        scan = idx.postings
        if "bucket" in scan.columns and "n_term_buckets" in idx.stats.columns:
            nb = int(idx.stats_row()["n_term_buckets"])
            scan = scan.filter(F.col("bucket").isin(sorted({t % nb for t in term_ids})))
        blocks = (
            scan.filter(F.col("term_id").isin(term_ids))
            .join(F.broadcast(qt), "term_id")
            .select(
                "query_id",
                "term",
                F.lit(g).alias("gen"),
                "segment",
                "first_doc",
                "last_doc",
                "n",
                "max_tf",
                "payload",
            )
        )
        gen_scans.append(blocks)
    if not gen_scans:
        return spark.createDataFrame([], "query_id long, rank int, doc_id long, score double")
    allblocks = gen_scans[0]
    for s in gen_scans[1:]:
        allblocks = allblocks.unionByName(s)

    if exclude is not None:
        # tombstones ride the same shuffle as the posting blocks: one
        # marker row (payload NULL, gen -1) per (query, tombstoned doc),
        # banded by the build-time rule doc_id % n_salts so each lands in
        # exactly the (query, segment) group whose postings could emit it
        qids = sorted({q for q, _ in pairs})
        qid_df = local_rows(spark, [(q,) for q in qids], "query_id long")
        tomb = (
            exclude.select(F.col("doc_id").cast("long"))
            .crossJoin(F.broadcast(qid_df))
            .select(
                "query_id",
                F.lit("\x00tomb").alias("term"),
                F.lit(-1).alias("gen"),
                F.pmod(F.col("doc_id"), F.lit(cfg.n_salts)).cast("int").alias("segment"),
                F.col("doc_id").alias("first_doc"),
                F.col("doc_id").alias("last_doc"),
                F.lit(0).cast("int").alias("n"),
                F.lit(0).cast("int").alias("max_tf"),
                F.lit(None).cast("binary").alias("payload"),
            )
        )
        allblocks = allblocks.unionByName(tomb)

    df_b = spark.sparkContext.broadcast(df_total)

    def bmw(pdf: pd.DataFrame) -> pd.DataFrame:
        # one (query, doc-band) group; cursors per (term, generation) —
        # generations have disjoint doc spaces, and a doc's band is
        # constant within its generation, so the band partials are exact
        qid = int(pdf["query_id"].iloc[0])
        tomb_mask = pdf["payload"].isna()
        excluded = frozenset(int(d) for d in pdf.loc[tomb_mask, "first_doc"])
        pdf = pdf[~tomb_mask]
        cursors = []
        for (term, _), g in pdf.groupby(["term", "gen"], sort=True):
            df_val = df_b.value[term]
            idf = float(np.log(1.0 + (n_docs - df_val + 0.5) / (df_val + 0.5)))
            max_tf = g["max_tf"].to_numpy(np.int64)
            cursors.append(
                _Cursor(
                    idf, k1, b, avgdl,
                    g["first_doc"].to_numpy(np.int64),
                    g["last_doc"].to_numpy(np.int64),
                    _tf_upper_bound(max_tf, idf, k1, b),
                    list(g["payload"]),
                    g["n"].to_numpy(np.int64),
                )
            )
        hits = _bmw_one_query(cursors, k, excluded)
        return pd.DataFrame(
            {
                "query_id": pd.Series([qid] * len(hits), dtype="int64"),
                "doc_id": pd.Series([d for d, _ in hits], dtype="int64"),
                "score": pd.Series([s for _, s in hits], dtype="float64"),
            }
        )

    scored = allblocks.groupBy("query_id", "segment").applyInPandas(
        bmw, "query_id long, doc_id long, score double"
    )
    return rank_topk(scored, k)
