"""Tests for the salted stats job, facet/grouping/join operators and the
CLI surface."""

from __future__ import annotations

import tempfile

import pytest

from lucene_spark.operators import facets
from lucene_spark.operators.build import build_index
from lucene_spark.operators.search import Searcher
from lucene_spark.operators.stats import (field_stats_from_tokens,
                                          term_stats_from_tokens)
from lucene_spark.oracle import OracleIndex
from lucene_spark.plans import query as Q
from lucene_spark.sources.corpus import generate_corpus


@pytest.fixture(scope="module")
def corpus():
    # ASCII-only slice so the JVM-regex tokenizer of the stats job agrees
    # with the Python analyzer (Java \w is ASCII, Python \w is Unicode)
    pdf = generate_corpus(300, seed=13)
    return pdf[pdf.content.map(lambda s: s.isascii())].reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))


@pytest.fixture(scope="module")
def searcher(spark, corpus):
    d = tempfile.mkdtemp(prefix="lucene_spark_facets_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4)
    return Searcher(spark, d)


def test_salted_term_stats_match_oracle(spark, corpus, oracle):
    df = spark.createDataFrame(corpus)
    got = {r["term"]: (r["df"], r["ttf"])
           for r in term_stats_from_tokens(df, salt_buckets=4).collect()}
    want = {t: (oracle.df(t), oracle.ttf(t)) for t in oracle.postings}
    assert got == want

    fs = field_stats_from_tokens(df).collect()[0]
    assert fs["doc_count"] == oracle.doc_count
    assert fs["sum_total_term_freq"] == oracle.sum_ttf


def test_facet_counts(spark, searcher, corpus, oracle):
    docs = spark.createDataFrame(corpus[["doc_id", "lang"]])
    got = {r["lang"]: r["cnt"] for r in
           facets.facet_counts(searcher, Q.Term("parse"), docs,
                               "lang").collect()}
    matched = set(oracle.score(Q.Term("parse")))
    want: dict[str, int] = {}
    for _, row in corpus.iterrows():
        if row.doc_id in matched:
            want[row.lang] = want.get(row.lang, 0) + 1
    assert got == want


def test_range_facets_overlapping(spark, searcher, corpus, oracle):
    import numpy as np
    docs = spark.createDataFrame(corpus.assign(
        clen=corpus.content.str.len())[["doc_id", "clen"]])
    buckets = [(0, 500), (300, 900), (0, 10**6)]
    got = {r["bucket"]: r["cnt"] for r in
           facets.range_facet_counts(searcher, Q.Term("parse"), docs,
                                     "clen", buckets).collect()}
    matched = set(oracle.score(Q.Term("parse")))
    lens = {r.doc_id: len(r.content) for r in corpus.itertuples()}
    for lo, hi in buckets:
        want = sum(1 for d in matched if lo <= lens[d] < hi)
        assert got[f"range_{lo}_{hi}"] == want
    assert got["range_0_1000000"] == len(matched)


def test_drill_sideways(spark, searcher, corpus, oracle):
    docs = spark.createDataFrame(corpus[["doc_id", "lang"]])
    rows = facets.drill_sideways(searcher, Q.Term("parse"), Q.Term("scan"),
                                 docs, "lang").collect()
    base = set(oracle.score(Q.Term("parse")))
    both = base & set(oracle.score(Q.Term("scan")))
    lang_of = dict(zip(corpus.doc_id, corpus.lang))
    for r in rows:
        assert r["sideways_cnt"] == sum(1 for d in base
                                        if lang_of[d] == r["lang"])
        assert r["drill_cnt"] == sum(1 for d in both
                                     if lang_of[d] == r["lang"])


def test_query_join(spark, searcher, corpus, oracle):
    docs = spark.createDataFrame(corpus[["doc_id", "repo"]])
    out = facets.query_join(searcher, Q.Term("flush"), docs, "repo",
                            docs, "repo")
    matched_repos = {r for d, r in zip(corpus.doc_id, corpus.repo)
                     if d in set(oracle.score(Q.Term("flush")))}
    want = sorted(d for d, r in zip(corpus.doc_id, corpus.repo)
                  if r in matched_repos)
    assert sorted(r["doc_id"] for r in out.collect()) == want


def test_to_parent_block_join(spark, searcher, corpus, oracle):
    """ToParentBlockJoinQuery: parents close 5-doc blocks; Max/Total/Avg
    score modes equal a per-block numpy aggregation of the oracle's child
    scores."""
    import numpy as np
    from pyspark.sql import functions as F

    doc_ids = sorted(corpus.doc_id)
    parents = [d for d in doc_ids if d % 5 == 4]
    pdf = spark.createDataFrame([(int(p),) for p in parents], "doc_id long")
    child_scores = oracle.score(Q.Term("parse"))
    # expected per-parent aggregation (children = (prev_parent, parent))
    want: dict[str, dict[int, float]] = {"max": {}, "total": {}, "avg": {}}
    nch: dict[int, int] = {}
    parr = np.asarray(parents)
    for d, s in child_scores.items():
        if d % 5 == 4:
            continue
        i = int(np.searchsorted(parr, d))
        if i >= len(parr):
            continue
        p = int(parr[i])
        want["max"][p] = max(want["max"].get(p, -1e30), float(s))
        want["total"][p] = want["total"].get(p, 0.0) + float(s)
        nch[p] = nch.get(p, 0) + 1
    want["avg"] = {p: want["total"][p] / nch[p] for p in nch}
    for mode in ("max", "total", "avg"):
        out = {r["parent_id"]: (r["score"], r["n_children"])
               for r in facets.to_parent_block_join(
                   searcher, Q.Term("parse"), pdf, score_mode=mode,
                   bucket=8).collect()}
        assert set(out) == set(want[mode]), mode
        for p, (s, n) in out.items():
            assert n == nch[p]
            assert np.float32(s) == np.float32(want[mode][p]), (mode, p)


def test_cli_zip_and_search(spark, searcher, tmp_path):
    from lucene_spark import cli
    out = tmp_path / "pkg.zip"
    assert cli.main(["zip", str(out)]) == 0
    import zipfile
    names = zipfile.ZipFile(out).namelist()
    assert "lucene_spark/operators/search.py" in names
    # search subcommand against the existing index (reuses the session)
    assert cli.main(["search", "--index", searcher.index_dir,
                     "--query", "parse OR emit", "--k", "3"]) == 0


def test_block_join_small_arrow_batches(spark, searcher, corpus):
    """Regression: _with_starts must carry the previous BATCH's last parent
    (not the previous partition's) when Arrow slices one partition into
    many batches — run with maxRecordsPerBatch below the parent count and
    compare against the default-batched result."""
    doc_ids = sorted(corpus.doc_id)
    parents = [d for d in doc_ids if d % 5 == 4]
    pdf = spark.createDataFrame([(int(p),) for p in parents], "doc_id long")

    def run():
        return sorted((r["parent_id"], r["score"], r["n_children"])
                      for r in facets.to_parent_block_join(
                          searcher, Q.Term("parse"), pdf,
                          score_mode="total", bucket=8).collect())

    want = run()
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "3")   # far below len(parents) per partition
        assert run() == want
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert len(want) > 1


def test_facet_path_counts_and_drill_down(spark, searcher, corpus, oracle):
    """Hierarchical taxonomy facets: prefix rollup counts + child-level
    drill-down equal a per-doc python recount over the oracle match set."""
    from pyspark.sql import functions as F

    dims = spark.createDataFrame(corpus[["doc_id", "repo", "lang"]]) \
        .select("doc_id", F.concat_ws("/", "repo", "lang").alias("path"))
    matched = set(oracle.score(Q.Term("parse")))
    paths = {int(d): f"{r}/{l}" for d, r, l in
             zip(corpus.doc_id, corpus.repo, corpus.lang)}
    want: dict[str, int] = {}
    for d in matched:
        segs = paths[d].split("/")
        for i in range(1, len(segs) + 1):
            pre = "/".join(segs[:i])
            want[pre] = want.get(pre, 0) + 1
    got = {r["path"]: r["cnt"] for r in facets.facet_path_counts(
        searcher, Q.Term("parse"), dims, "path").collect()}
    assert got == want
    # drill-down under the most common top level
    top = max((p for p in want if "/" not in p), key=lambda p: want[p])
    want_children: dict[str, int] = {}
    for d in matched:
        segs = paths[d].split("/")
        if segs[0] == top and len(segs) > 1:
            want_children[segs[1]] = want_children.get(segs[1], 0) + 1
    got_children = {r["child"]: r["cnt"] for r in facets.drill_down_path(
        searcher, Q.Term("parse"), dims, "path", top).collect()}
    assert got_children == want_children


def test_to_child_block_join(spark, searcher, corpus, oracle):
    """ToChildBlockJoinQuery: every child of a matching parent comes back
    carrying exactly its parent's score (ToChildBlockJoinScorer's
    parentScore propagation)."""
    import numpy as np

    doc_ids = sorted(corpus.doc_id)
    parents = [d for d in doc_ids if d % 5 == 4]
    pdf = spark.createDataFrame([(int(p),) for p in parents], "doc_id long")
    pscores = oracle.score(Q.Term("parse"))
    parr = np.asarray(parents)
    want: dict[int, tuple[int, np.float32]] = {}
    for c in doc_ids:
        if c % 5 == 4:
            continue
        i = int(np.searchsorted(parr, c))
        if i >= len(parr):
            continue
        p = int(parr[i])
        if p in pscores:
            want[c] = (p, np.float32(pscores[p]))
    out = {r["doc_id"]: (r["parent_id"], np.float32(r["score"]))
           for r in facets.to_child_block_join(
               searcher, Q.Term("parse"), pdf, bucket=8).collect()}
    assert out == want


def test_sum_association_facets(spark, searcher, corpus, oracle):
    """TaxonomyFacetSumIntAssociations: per-label SUM of a per-doc
    association value over the match set (not a doc count)."""
    docs = spark.createDataFrame(
        corpus.assign(clen=corpus.content.str.len().astype("int64"))
        [["doc_id", "lang", "clen"]])
    got = {r["lang"]: (r["assoc_sum"], r["cnt"]) for r in
           facets.sum_association_facets(searcher, Q.Term("parse"), docs,
                                         "lang", "clen").collect()}
    matched = set(oracle.score(Q.Term("parse")))
    want: dict[str, list[int]] = {}
    for _, row in corpus.iterrows():
        if row.doc_id in matched:
            s, n = want.get(row.lang, (0, 0))
            want[row.lang] = (s + len(row.content), n + 1)
    assert got == want


def test_sampled_facet_counts(spark, searcher, corpus, oracle):
    """RandomSamplingFacetsCollector role: deterministic md5 sample of
    the match set, counts amortized by the exact sampled rate — vs a
    brute twin of the same hash predicate."""
    import hashlib

    import pytest as _pytest

    docs = spark.createDataFrame(corpus[["doc_id", "lang"]])
    frac = 0.5
    cut = format(int(frac * 16**8), "08x")
    matched = set(oracle.score(Q.Term("parse")))
    sampled = {d for d in matched
               if hashlib.md5(str(d).encode()).hexdigest()[:8] < cut}
    want: dict[str, int] = {}
    lang_of = dict(zip(corpus.doc_id, corpus.lang))
    for d in sampled:
        want[lang_of[d]] = want.get(lang_of[d], 0) + 1
    rate = len(sampled) / len(matched)
    got = {r["lang"]: (r["sampled_cnt"], r["est_cnt"]) for r in
           facets.sampled_facet_counts(searcher, Q.Term("parse"), docs,
                                       "lang", frac).collect()}
    assert {k: v[0] for k, v in got.items()} == want
    for k, (c, est) in got.items():
        assert est == _pytest.approx(c / rate, rel=1e-12)
    with _pytest.raises(ValueError):
        facets.sampled_facet_counts(searcher, Q.Term("parse"), docs,
                                    "lang", 0.0)


def test_all_groups_count(spark, searcher, corpus, oracle):
    """AllGroupsCollector role: distinct group values over the match
    set."""
    docs = spark.createDataFrame(corpus[["doc_id", "lang"]])
    matched = set(oracle.score(Q.Term("parse")))
    want = len({row.lang for _, row in corpus.iterrows()
                if row.doc_id in matched})
    got = facets.all_groups_count(searcher, Q.Term("parse"), docs, "lang")
    assert got == want > 0


def test_distinct_values(spark, searcher, corpus, oracle):
    """grouping/DistinctValuesCollector.java: per-group distinct values
    of a second field over the match set, NULL values kept."""
    import pandas as pd
    vals = corpus[["doc_id", "lang"]].copy()
    # sparse second field with nulls (every 3rd doc missing)
    vals["flavor"] = [
        None if d % 3 == 0 else f"f{d % 2}" for d in vals.doc_id]
    docs = spark.createDataFrame(vals)
    got = {(r["lang"], r["flavor"]) for r in
           facets.distinct_values(searcher, Q.Term("parse"), docs,
                                  "lang", "flavor").collect()}
    matched = set(oracle.score(Q.Term("parse")))
    want = {(row.lang, (None if row.doc_id % 3 == 0
                        else f"f{row.doc_id % 2}"))
            for row in vals.itertuples() if row.doc_id in matched}
    assert got == want


def test_diversified_top_k(spark, searcher, corpus, oracle):
    """misc/search/DiversifiedTopDocsCollector.java: global top-k with
    at most max_per_key hits per key — parity with the greedy
    dual-queue collector replayed per-doc on the oracle scores."""
    keys = {int(d): int(d) % 5 for d in corpus.doc_id}
    docs = spark.createDataFrame(
        [(d, f"k{v}") for d, v in keys.items()], "doc_id long, src string")
    q = Q.Or((Q.Term("parse"), Q.Term("token")))
    scores = oracle.score(q)

    def greedy(k, m):
        # the reference's insert() protocol, replayed in docID order
        import heapq
        per_key: dict[str, list] = {}
        glob: list = []          # min-heap of (score, -doc)

        def less(a, b):          # PQ lessThan: a below b
            return a[0] < b[0] or (a[0] == b[0] and -a[1] > -b[1])

        for doc in sorted(scores):
            s = float(scores[doc])
            item = (s, -doc)
            if len(glob) >= k and less(item, glob[0]):
                continue
            key = f"k{keys[doc] }"
            kq = per_key.setdefault(key, [])
            if len(kq) >= m:
                if less(item, kq[0]):
                    continue
                evict = heapq.heappushpop(kq, item)
                glob.remove(evict)
                heapq.heapify(glob)
                heapq.heappush(glob, item)
            else:
                heapq.heappush(kq, item)
                heapq.heappush(glob, item)
                if len(glob) > k:
                    out = heapq.heappop(glob)
                    okq = per_key[f"k{keys[-out[1]]}"]
                    okq.remove(out)
                    heapq.heapify(okq)
        return sorted(((-d, s) for s, d in glob),
                      key=lambda t: (-t[1], t[0]))

    for k, m in [(10, 1), (10, 2), (5, 3), (25, 1)]:
        res = facets.diversified_top_k(searcher, q, docs, "src",
                                       k=k, max_per_key=m).collect()
        got = [(r["doc_id"], r["score"]) for r in res]
        want = [(d, pytest.approx(s, rel=1e-6)) for d, s in greedy(k, m)]
        assert got == want, (k, m)
        # declarative equivalence: per-key rank<=m then global top-k
        ranked = sorted(scores.items(), key=lambda t: (-t[1], t[0]))
        seen: dict[int, int] = {}
        decl = []
        for d, s in ranked:
            kk = keys[d]
            seen[kk] = seen.get(kk, 0) + 1
            if seen[kk] <= m:
                decl.append((d, s))
        assert [d for d, _ in got] == [d for d, _ in decl[:k]], (k, m)
        assert all(r["rank"] == i + 1 for i, r in enumerate(res))


def test_doc_values_stats(spark, searcher, corpus, oracle):
    """misc/search/DocValuesStats.java: count/missing/min/max/sum/mean/
    population-variance of a numeric field over the match set."""
    import numpy as np
    vals = corpus[["doc_id"]].copy()
    vals["nval"] = [None if d % 4 == 0 else (d * 7) % 100
                    for d in vals.doc_id]
    docs = spark.createDataFrame(vals, "doc_id long, nval long")
    from lucene_spark.operators.stats import doc_values_stats
    row = doc_values_stats(searcher, Q.Term("parse"), docs,
                           "nval").collect()[0]
    matched = set(oracle.score(Q.Term("parse")))
    present = [(d * 7) % 100 for d in matched if d % 4 != 0]
    assert row["count"] == len(present)
    assert row["missing"] == len(matched) - len(present)
    assert row["min"] == min(present)
    assert row["max"] == max(present)
    assert row["sum"] == sum(present)
    assert row["mean"] == pytest.approx(np.mean(present), rel=1e-12)
    assert row["variance"] == pytest.approx(np.var(present), rel=1e-12)
    assert row["stdev"] == pytest.approx(np.std(present), rel=1e-12)
    # empty match set: one row, reference initial state
    empty = doc_values_stats(searcher, Q.Term("zzzznomatch"), docs,
                             "nval").collect()[0]
    assert (empty["count"], empty["missing"]) == (0, None)
    assert empty["min"] is None and empty["sum"] is None
    assert empty["mean"] == 0.0 and empty["variance"] == 0.0


def test_group_facet_counts(spark, searcher, corpus, oracle):
    """TermGroupFacetCollector semantics: a group counts once per facet
    value over the match set; minCount / prefix / both orderings /
    missing tally vs a brute distinct-pair replay."""
    from pyspark.sql import functions as F
    rows = [(int(r.doc_id), str(r.lang),
             None if int(r.doc_id) % 11 == 0 else f"f{int(r.doc_id) % 7}")
            for _, r in corpus.iterrows()]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, fac string")
    matched = set(oracle.score(Q.Term("parse")))
    pairs = {(g, f) for d, g, f in rows if d in matched}
    want: dict[str, int] = {}
    for g, f in pairs:
        if f is not None:
            want[f] = want.get(f, 0) + 1
    missing = sum(1 for g, f in pairs if f is None)

    got = facets.group_facet_counts(searcher, Q.Term("parse"), docs,
                                    "lang", "fac").collect()
    assert {r["facet"]: r["cnt"] for r in got} == want
    # ordering: count desc, value asc
    ranked = sorted(got, key=lambda r: r["rank"])
    assert [(r["facet"], r["cnt"]) for r in ranked] == \
        sorted(want.items(), key=lambda p: (-p[1], p[0]))

    # value-ordered + size truncation
    byv = facets.group_facet_counts(searcher, Q.Term("parse"), docs,
                                    "lang", "fac", order_by_count=False,
                                    size=3).collect()
    assert [r["facet"] for r in sorted(byv, key=lambda r: r["rank"])] == \
        sorted(want)[:3]

    # minCount + prefix + missing row
    mc = min(want.values()) + 1
    flt = facets.group_facet_counts(searcher, Q.Term("parse"), docs,
                                    "lang", "fac", min_count=mc,
                                    facet_prefix="f1",
                                    include_missing=True).collect()
    got_m = [r for r in flt if r["facet"] is None]
    assert len(got_m) == 1 and got_m[0]["cnt"] == missing
    assert {r["facet"]: r["cnt"] for r in flt if r["facet"] is not None} \
        == {f: c for f, c in want.items()
            if c >= mc and f.startswith("f1")}
