"""BM25 retrieval (ext/retrieval.py) vs an independent in-Python
reimplementation on a hand-built corpus — complements the registry's
DuckDB differential check with a second, SQL-free oracle."""

from __future__ import annotations

import math

from spk_sl_validation_spark.ext.retrieval import BM25_B, BM25_K1, bm25_rank

DOCS = [
    (1, "apple banana apple cherry"),
    (2, "banana banana banana"),
    (3, "cherry durian elderberry fig grape"),
    (4, "apple apple apple apple banana"),
    (5, "fig grape honeydew"),
    (6, "durian"),
]
QUERIES = [(10, "apple banana"), (20, "durian fig"), (30, "honeydew")]


def _bm25_reference(docs, queries, k1=BM25_K1, b=BM25_B, top_k=5):
    """Straight-from-the-formula BM25 (dicts and loops, no SQL)."""
    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, qtext in queries:
        scores = {}
        for term in qtext.split():
            df = sum(1 for t in toks.values() if term in t)
            if df == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for d, t in toks.items():
                tf = t.count(term)
                if tf == 0:
                    continue
                dl = len(t)
                s = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
                scores[d] = scores.get(d, 0.0) + round(s, 12)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        out[qid] = [(d, round(s, 6)) for d, s in ranked]
    return out


def test_bm25_matches_independent_reimplementation(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = bm25_rank(docs, QUERIES).collect()
    expected = _bm25_reference(DOCS, QUERIES)
    by_query: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rnk)):
        by_query.setdefault(r.query_id, []).append((r.doc_id, r.score))
    assert set(by_query) == {10, 20, 30}
    for qid, exp in expected.items():
        assert by_query[qid] == exp, f"query {qid}: {by_query[qid]} != {exp}"


def test_bm25_excludes_docs_without_query_terms(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = bm25_rank(docs, [(1, "honeydew")]).collect()
    assert [r.doc_id for r in got] == [5]
    assert [r.rnk for r in got] == [1]


def test_bm25_ordering_properties(spark):
    # 'durian' and 'fig' have equal df (2 each): doc 3 matches both
    # terms so it must rank first; docs 6 and 5 match one term each
    # with tf=1, and the shorter doc (6, dl=1) must outscore the
    # longer (5, dl=3) under the length normalization.
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.score for r in bm25_rank(docs, [(1, "durian fig")]).collect()}
    assert set(got) == {3, 5, 6}
    assert got[3] == max(got.values())
    assert got[6] > got[5]


def test_bm25_indexed_path_equals_direct(spark):
    from spk_sl_validation_spark.ext.retrieval import bm25_index_tables, bm25_rank_indexed

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    direct = sorted(map(tuple, bm25_rank(docs, QUERIES).collect()))
    postings, df_tbl, stats = bm25_index_tables(docs)
    indexed = sorted(map(tuple, bm25_rank_indexed(QUERIES, postings, df_tbl, stats).collect()))
    assert indexed == direct  # exact, floats included


def test_bm25_index_merge_equals_rebuild(spark):
    from spk_sl_validation_spark.ext.retrieval import (
        bm25_index_tables,
        bm25_rank_indexed,
        merge_into_bm25_index,
    )

    old = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    new = spark.createDataFrame(DOCS[4:], "doc_id long, text string")
    merged = merge_into_bm25_index(*bm25_index_tables(old), new)
    rebuilt = bm25_index_tables(spark.createDataFrame(DOCS, "doc_id long, text string"))
    for m, r, key in zip(merged, rebuilt, (["doc_id", "term"], ["term"], [])):
        ms = sorted(map(tuple, m.collect()))
        rs = sorted(map(tuple, r.collect()))
        assert ms == rs, f"artifact keyed {key}: {ms[:5]} != {rs[:5]}"
    got = sorted(map(tuple, bm25_rank_indexed(QUERIES, *merged).collect()))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    assert got == sorted(map(tuple, bm25_rank(docs, QUERIES).collect()))


def test_bm25_persisted_index_prunes_at_scan(spark, tmp_path):
    """The production index story end-to-end: postings written
    term-clustered to parquet, read back, ranked — result equal to
    the in-memory path, and the query-term filter reaches the
    parquet scan (PushedFilters In(term, …)), so at 100 TB the scan
    touches only the query terms' row groups/files."""
    from spk_sl_validation_spark.ext.retrieval import bm25_index_tables, bm25_rank_indexed
    from spk_sl_validation_spark.sources.sinks import write_clustered

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, df_tbl, stats = bm25_index_tables(docs)
    p_path = str(tmp_path / "postings")
    write_clustered(postings, p_path, ["term"], n_files=2)
    (tmp_path / "df").mkdir()
    df_tbl.write.mode("overwrite").parquet(str(tmp_path / "df" / "t"))
    stats.write.mode("overwrite").parquet(str(tmp_path / "stats"))

    postings2 = spark.read.parquet(p_path)
    df2 = spark.read.parquet(str(tmp_path / "df" / "t"))
    stats2 = spark.read.parquet(str(tmp_path / "stats"))
    got = bm25_rank_indexed(QUERIES, postings2, df2, stats2)
    direct = bm25_rank_indexed(QUERIES, postings, df_tbl, stats)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, direct.collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(term, " in plan, plan[:2000]


def test_bm25_repeated_query_term_counts_once(spark):
    """A term repeated inside one query must contribute its per-doc
    partial once (ADVICE round-3: the dedupe lives in code now, not a
    docstring)."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    once = sorted(map(tuple, bm25_rank(docs, [(1, "apple banana")]).collect()))
    thrice = sorted(map(tuple, bm25_rank(docs, [(1, "apple apple apple banana")]).collect()))
    assert once == thrice


def test_bm25_merge_rejects_overlapping_ids(spark):
    """merge_into_bm25_index fails loudly when a new id already exists
    in the indexed corpus (silent overlap would double-count df/n_docs/
    sum_dl and corrupt every subsequent indexed score)."""
    import pytest

    from spk_sl_validation_spark.ext.retrieval import bm25_index_tables, merge_into_bm25_index

    old = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    overlapping = spark.createDataFrame(DOCS[3:], "doc_id long, text string")  # doc 4 in both
    with pytest.raises(ValueError, match="already"):
        merge_into_bm25_index(*bm25_index_tables(old), overlapping)


def _rrf_reference(docs, queries, rrf_k=60, pool=20, top_k=10):
    """Straight-from-the-formula hybrid RRF (dicts and loops): BM25
    pool + binary-cosine coordinate-match pool, fused 1/(k+rank)."""
    bm25 = _bm25_reference(docs, queries, top_k=pool)
    toks = {d: t.split() for d, t in docs}
    nd = {d: len(set(t)) for d, t in toks.items()}
    out = {}
    for qid, qtext in queries:
        qterms = set(qtext.split())
        nq = len(qterms)  # set semantics: nq = DISTINCT query terms
        cos_scores = {}
        for d, t in toks.items():
            ov = len(qterms & set(t))
            if ov:
                cos_scores[d] = round(ov / math.sqrt(nd[d] * nq), 6)
        cos_pool = sorted(cos_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:pool]
        contrib = {}
        for rnk, (d, _) in enumerate(bm25.get(qid, []), 1):
            c, br, cr = contrib.get(d, (0.0, None, None))
            contrib[d] = (c + 1.0 / (rrf_k + rnk), rnk, cr)
        for rnk, (d, _) in enumerate(cos_pool, 1):
            c, br, cr = contrib.get(d, (0.0, None, None))
            contrib[d] = (c + 1.0 / (rrf_k + rnk), br, rnk)
        fused = sorted(
            ((d, round(c, 6), br, cr) for d, (c, br, cr) in contrib.items()),
            key=lambda r: (-r[1], r[0]),
        )[:top_k]
        out[qid] = [
            (qid, d, s, br, cr, rnk) for rnk, (d, s, br, cr) in enumerate(fused, 1)
        ]
    return out


def test_hybrid_rrf_indexed_matches_independent_reimplementation(spark):
    from spk_sl_validation_spark.ext.retrieval import (
        bm25_doc_term_counts,
        bm25_index_tables,
        hybrid_rrf_rank_indexed,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, df_tbl, stats = bm25_index_tables(docs)
    nd_tbl = bm25_doc_term_counts(postings)
    got = hybrid_rrf_rank_indexed(
        QUERIES, postings, df_tbl, stats, nd_tbl, pool=4, top_k=3
    ).collect()
    expected = _rrf_reference(DOCS, QUERIES, pool=4, top_k=3)
    by_query: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rnk)):
        by_query.setdefault(r.query_id, []).append(tuple(r))
    assert set(by_query) == {10, 20, 30}
    for qid, exp in expected.items():
        assert by_query[qid] == exp, f"query {qid}: {by_query[qid]} != {exp}"


def test_hybrid_rrf_registry_indexed_equals_direct(spark, sf_dir):
    """The registered hybrid_rrf_retrieval_indexed query returns
    byte-identical rows to hybrid_rrf_retrieval (same oracle by
    construction; this pins the engine side)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    direct = sorted(map(tuple, qs["hybrid_rrf_retrieval"](spark, sf_dir).collect()))
    indexed = sorted(
        map(tuple, qs["hybrid_rrf_retrieval_indexed"](spark, sf_dir).collect())
    )
    assert indexed == direct


def test_hybrid_rrf_persisted_index_scans_no_text(spark, tmp_path):
    """The production RRF story: all four index artifacts persisted to
    parquet, read back, fused — result equal to the in-memory path,
    the postings term filter reaches the scan, and the query-time
    plan reads NO document text (the direct plan's two corpus-text
    scans are gone)."""
    from spk_sl_validation_spark.ext.retrieval import (
        bm25_doc_term_counts,
        bm25_index_tables,
        hybrid_rrf_rank_indexed,
    )
    from spk_sl_validation_spark.sources.sinks import write_clustered

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, df_tbl, stats = bm25_index_tables(docs)
    nd_tbl = bm25_doc_term_counts(postings)
    write_clustered(postings, str(tmp_path / "postings"), ["term"], n_files=2)
    df_tbl.write.parquet(str(tmp_path / "df"))
    stats.write.parquet(str(tmp_path / "stats"))
    nd_tbl.write.parquet(str(tmp_path / "nd"))

    got = hybrid_rrf_rank_indexed(
        QUERIES,
        spark.read.parquet(str(tmp_path / "postings")),
        spark.read.parquet(str(tmp_path / "df")),
        spark.read.parquet(str(tmp_path / "stats")),
        spark.read.parquet(str(tmp_path / "nd")),
        pool=4,
        top_k=3,
    )
    mem = hybrid_rrf_rank_indexed(
        QUERIES, postings, df_tbl, stats, nd_tbl, pool=4, top_k=3
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, mem.collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan, plan[:2000]
    assert "PushedFilters: [In(term, " in plan, plan[:2000]


def test_rrf_index_merge_equals_rebuild(spark):
    """The four-artifact hybrid-RRF index merges under the same
    disjoint-ids law as the BM25 triple: merged nd == rebuilt nd, and
    fused rankings through the merged artifacts equal the rebuilt
    path exactly."""
    from spk_sl_validation_spark.ext.retrieval import (
        bm25_doc_term_counts,
        bm25_index_tables,
        hybrid_rrf_rank_indexed,
        merge_into_bm25_index,
    )

    old = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    new = spark.createDataFrame(DOCS[4:], "doc_id long, text string")
    op, od, os_ = bm25_index_tables(old)
    merged = merge_into_bm25_index(op, od, os_, new, nd_tbl=bm25_doc_term_counts(op))
    assert len(merged) == 4
    full = spark.createDataFrame(DOCS, "doc_id long, text string")
    rp, rd, rs = bm25_index_tables(full)
    rebuilt = (rp, rd, rs, bm25_doc_term_counts(rp))
    assert sorted(map(tuple, merged[3].collect())) == sorted(
        map(tuple, rebuilt[3].collect())
    )
    got = sorted(
        map(tuple, hybrid_rrf_rank_indexed(QUERIES, *merged, pool=4, top_k=3).collect())
    )
    want = sorted(
        map(tuple, hybrid_rrf_rank_indexed(QUERIES, *rebuilt, pool=4, top_k=3).collect())
    )
    assert got == want


def test_bm25_index_remove_equals_rebuild(spark):
    """Deleting docs from the artifacts == rebuilding the index on the
    surviving corpus, artifact-by-artifact (postings rows, df rows
    incl. dropped zero-df vocabulary, exact stats) and in ranking."""
    from spk_sl_validation_spark.ext.retrieval import (
        bm25_index_tables,
        bm25_rank_indexed,
        remove_from_bm25_index,
    )

    full = spark.createDataFrame(DOCS, "doc_id long, text string")
    gone_ids = [d for d, _ in DOCS[::2]]
    rm = spark.createDataFrame([(d,) for d in gone_ids], "doc_id long")
    removed = remove_from_bm25_index(*bm25_index_tables(full), rm)
    survivors = [row for row in DOCS if row[0] not in gone_ids]
    rebuilt = bm25_index_tables(spark.createDataFrame(survivors, "doc_id long, text string"))
    for m, r, label in zip(removed, rebuilt, ("postings", "df", "stats")):
        ms = sorted(map(tuple, m.collect()))
        rs = sorted(map(tuple, r.collect()))
        assert ms == rs, f"{label}: {ms[:5]} != {rs[:5]}"
    got = sorted(map(tuple, bm25_rank_indexed(QUERIES, *removed).collect()))
    want = sorted(
        map(
            tuple,
            bm25_rank(
                spark.createDataFrame(survivors, "doc_id long, text string"), QUERIES
            ).collect(),
        )
    )
    assert got == want


def test_bm25_index_remove_then_merge_roundtrips(spark):
    """The re-crawl cycle: remove a batch, merge the same docs back —
    every artifact row-identical to the untouched index (including the
    4th RRF artifact nd)."""
    from spk_sl_validation_spark.ext.retrieval import (
        bm25_doc_term_counts,
        bm25_index_tables,
        merge_into_bm25_index,
        remove_from_bm25_index,
    )

    full = spark.createDataFrame(DOCS, "doc_id long, text string")
    op, od, os_ = bm25_index_tables(full)
    nd = bm25_doc_term_counts(op)
    churn = spark.createDataFrame(DOCS[1::3], "doc_id long, text string")
    rm = churn.select("doc_id")
    after_rm = remove_from_bm25_index(op, od, os_, rm, nd_tbl=nd)
    back = merge_into_bm25_index(*after_rm[:3], churn, nd_tbl=after_rm[3])
    for m, o, label in zip(back, (op, od, os_, nd), ("postings", "df", "stats", "nd")):
        ms = sorted(map(tuple, m.collect()))
        rs = sorted(map(tuple, o.collect()))
        assert ms == rs, f"{label} not restored: {ms[:5]} != {rs[:5]}"


def test_bm25_remove_rejects_unindexed_id(spark):
    """Removing an id with no postings would corrupt stats silently —
    must raise instead (also covers zero-token docs, which have no
    posting rows to subtract)."""
    import pytest

    from spk_sl_validation_spark.ext.retrieval import bm25_index_tables, remove_from_bm25_index

    full = spark.createDataFrame(DOCS, "doc_id long, text string")
    rm = spark.createDataFrame([(999,)], "doc_id long")
    with pytest.raises(ValueError, match="no postings"):
        remove_from_bm25_index(*bm25_index_tables(full), rm)


def test_bm25_remove_empty_batch_is_identity(spark):
    """A churn filter that matches nothing must leave every artifact
    untouched — in particular stats, where SUM over zero removed rows
    is NULL and an un-coalesced subtraction would silently NULL
    sum_dl (review finding r6)."""
    from spk_sl_validation_spark.ext.retrieval import bm25_index_tables, remove_from_bm25_index

    full = spark.createDataFrame(DOCS, "doc_id long, text string")
    artifacts = bm25_index_tables(full)
    empty = spark.createDataFrame([], "doc_id long")
    removed = remove_from_bm25_index(*artifacts, empty)
    for m, o, label in zip(removed, artifacts, ("postings", "df", "stats")):
        ms = sorted(map(tuple, m.collect()))
        rs = sorted(map(tuple, o.collect()))
        assert ms == rs, f"{label} changed on empty remove: {ms[:3]} != {rs[:3]}"
        for row in ms:
            assert None not in row, f"{label} contains NULL after empty remove"


# ---------------------------------------------------------------------------
# Exact phrase search (round 10)
# ---------------------------------------------------------------------------


def _phrase_docs(spark):
    rows = [
        (0, "a b a b a"),        # "a b" at 1,3; "b a" at 2,4
        (1, "x x x"),            # "x x" overlapping at 1,2
        (2, "a"),                # shorter than any 2-term phrase
        (3, "b a b"),            # "a b" at 2
        (4, ""),                 # empty text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_search_positions_and_overlaps(spark):
    from spk_sl_validation_spark.ext.retrieval import phrase_search

    out = phrase_search(_phrase_docs(spark), ((0, "a b"), (1, "x x"), (2, "a b a")))
    got = {(r.phrase_id, r.doc_id): (r.n_matches, r.first_pos) for r in out.collect()}
    assert got == {
        (0, 0): (2, 1),
        (0, 3): (1, 2),
        (1, 1): (2, 1),   # overlapping matches both count
        (2, 0): (2, 1),   # 3-term phrase, overlapping at 1 and 3
    }


def test_phrase_search_indexed_matches_direct(spark):
    from spk_sl_validation_spark.ext.retrieval import (
        phrase_index,
        phrase_search,
        phrase_search_indexed,
    )

    docs = _phrase_docs(spark)
    phrases = ((0, "a b"), (1, "x x"), (2, "a b a"), (3, "b a b"))
    direct = sorted(map(tuple, phrase_search(docs, phrases).collect()))
    indexed = sorted(
        map(tuple, phrase_search_indexed(phrase_index(docs), phrases).collect())
    )
    assert direct == indexed


def test_phrase_search_rejects_empty_phrases(spark):
    import pytest as _pytest

    from spk_sl_validation_spark.ext.retrieval import phrase_search

    with _pytest.raises(ValueError):
        phrase_search(_phrase_docs(spark), ())
