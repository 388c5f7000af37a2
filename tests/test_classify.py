"""Parity tests for the classification module (reference
``lucene/classification``): SimpleNaiveBayesClassifier and
KNearestNeighborClassifier vs brute-force Python twins computed straight
from the corpus with the reference's formulas."""

from __future__ import annotations

import math
import tempfile
from collections import Counter

import numpy as np
import pytest

from lucene_spark.operators.build import build_index
from lucene_spark.operators.classify import (assign_class, knn_classify,
                                             naive_bayes_classify,
                                             term_doc_pairs)
from lucene_spark.operators.search import Searcher
from lucene_spark.oracle import OracleIndex
from lucene_spark.plans import query as Q
from lucene_spark.sources.corpus import generate_corpus

N_DOCS = 200


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_DOCS, seed=11)


@pytest.fixture(scope="module")
def labels(corpus):
    # deterministic 3-way labeling of the corpus
    return {int(d): f"c{int(d) % 3}" for d in corpus.doc_id}


@pytest.fixture(scope="module")
def searcher(spark, corpus):
    d = tempfile.mkdtemp(prefix="lucene_spark_classify_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4)
    return Searcher(spark, d)


@pytest.fixture(scope="module")
def class_df(spark, labels):
    return spark.createDataFrame(
        [(d, c) for d, c in sorted(labels.items())], "doc_id long, cls string")


def _brute_nb(corpus, labels, input_texts):
    """Reference math, straight from SimpleNaiveBayesClassifier.java."""
    from lucene_spark.functions.analysis import analyze_text
    doc_tokens = {int(d): list(analyze_text(str(t))[0]) for d, t in
                  zip(corpus.doc_id, corpus.content)}
    classes = sorted(set(labels.values()))
    dwc = len(labels)
    df_c = Counter(labels.values())
    # sumDocFreq / docCount: unique terms per doc summed / #docs
    sum_df = sum(len(set(toks)) for toks in doc_tokens.values())
    avg_unique = sum_df / len(doc_tokens)
    # hits(w, c)
    hits: Counter = Counter()
    for d, toks in doc_tokens.items():
        for w in set(toks):
            hits[(w, labels[d])] += 1
    out = {}
    for iid, text in input_texts.items():
        toks = list(analyze_text(text)[0])
        scores = {}
        for c in classes:
            den = avg_unique * df_c[c] + dwc
            s = math.log(df_c[c]) - math.log(dwc)
            for w in toks:
                s += math.log((hits.get((w, c), 0) + 1) / den)
            scores[c] = s
        out[iid] = scores
    return out


def test_term_doc_pairs(searcher, corpus):
    from lucene_spark.functions.analysis import analyze_text
    want = {}
    for d, t in zip(corpus.doc_id, corpus.content):
        for w in set(analyze_text(str(t))[0]):
            want.setdefault(w, set()).add(int(d))
    terms = ["parse", "emit", "token", "zzz_absent"]
    got = term_doc_pairs(searcher, terms).collect()
    by_term: dict[str, set] = {}
    for r in got:
        by_term.setdefault(r["term"], set()).add(r["doc_id"])
    for t in terms:
        assert by_term.get(t, set()) == want.get(t, set()), t


def test_naive_bayes_parity(spark, searcher, corpus, labels, class_df):
    input_texts = {int(d): str(t) for d, t in
                   list(zip(corpus.doc_id, corpus.content))[:15]}
    inputs = spark.createDataFrame(
        sorted(input_texts.items()), "input_id long, text string")
    scores = naive_bayes_classify(searcher, inputs, class_df)
    got = {(r["input_id"], r["cls"]): r["score"] for r in scores.collect()}
    want = _brute_nb(corpus, labels, input_texts)
    assert {i for i, _ in got} == set(input_texts)
    for (i, c), s in got.items():
        assert s == pytest.approx(want[i][c], rel=1e-12), (i, c)
    # argmax rows agree with the brute argmax (ties → class asc)
    ass = {r["input_id"]: r["cls"]
           for r in assign_class(scores).collect()}
    for i, sc in want.items():
        best = min(sc.items(), key=lambda p: (-p[1], p[0]))[0]
        assert ass[i] == best, i


def test_knn_classifier_vote(spark, searcher, corpus, labels, class_df):
    """Vote = Σ(score/maxScore per class) / min(k, labeled hits), ordered
    (vote desc, class asc) — computed from the engine's own MLT top-k."""
    from lucene_spark.operators.mlt import more_like_this
    docs = spark.createDataFrame(
        [(int(d), str(t)) for d, t in zip(corpus.doc_id, corpus.content)],
        "doc_id long, text string")
    k = 10
    top = more_like_this(searcher, docs, doc_id=3, k=k).collect()
    maxs = max(float(r["score"]) for r in top)
    boosts: dict = {}
    for r in top:
        c = labels[r["doc_id"]]
        boosts[c] = boosts.get(c, 0.0) + float(r["score"]) / maxs
    sumdoc = len(top)
    denom = float(k) if sumdoc >= k else float(sumdoc)
    want = sorted(((c, b / denom) for c, b in boosts.items()),
                  key=lambda p: (-p[1], p[0]))
    got = [(r["cls"], r["score"]) for r in
           knn_classify(searcher, docs, 3, class_df, k=k)
           .orderBy("rank").collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], rel=1e-12)


def test_knn_fuzzy_classifier(spark, searcher, corpus, labels, class_df):
    """KNearestFuzzyClassifier: fuzzified interesting terms vote — same
    vote math as knn_classify over the blended-fuzzy top-k."""
    from lucene_spark.operators.classify import knn_fuzzy_classify
    from lucene_spark.operators.mlt import interesting_terms
    docs = spark.createDataFrame(
        [(int(d), str(t)) for d, t in zip(corpus.doc_id, corpus.content)],
        "doc_id long, text string")
    k = 10
    text = corpus.content[3]
    sel = interesting_terms(searcher, str(text), 25, 2, 5)
    q = Q.Or(tuple(Q.MultiTerm("fuzzy", t, edits=2, scored=True)
                   for t, _ in sel))
    top = searcher.search(q, k=k).collect()
    maxs = max(float(r["score"]) for r in top)
    boosts: dict = {}
    for r in top:
        c = labels[r["doc_id"]]
        boosts[c] = boosts.get(c, 0.0) + float(r["score"]) / maxs
    denom = float(k) if len(top) >= k else float(len(top))
    want = sorted(((c, b / denom) for c, b in boosts.items()),
                  key=lambda p: (-p[1], p[0]))
    got = [(r["cls"], r["score"]) for r in
           knn_fuzzy_classify(searcher, docs, 3, class_df, k=k)
           .orderBy("rank").collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], rel=1e-12)


def test_term_doc_pairs_semi_join_path(spark, searcher, corpus):
    """terms_df broadcast semi-join path ≡ literal pushed-filter path."""
    terms = ["parse", "emit", "token"]
    a = sorted((r["term"], r["doc_id"])
               for r in term_doc_pairs(searcher, terms).collect())
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    b = sorted((r["term"], r["doc_id"])
               for r in term_doc_pairs(searcher, None,
                                       terms_df=tdf).collect())
    assert a == b and len(a) > 0


def test_knn_classify_text(spark, searcher, corpus, class_df, labels):
    """KNearestNeighborClassifier.getClasses on raw text (classification/
    KNearestNeighborClassifier.java:96-214): engine vs a full replay —
    MLT term selection (f32 tf·idf, min-of-selected boost norm), BM25
    boosted-OR top-k, per-class (count·normBoost)/k with the sumdoc
    correction."""
    import math

    from lucene_spark.operators.classify import knn_classify_text
    from lucene_spark.plans import query as Q

    from lucene_spark.oracle import OracleIndex
    oracle = OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))
    classes = class_df
    text = "parse parse scan scan token stream data data"
    k = 10
    got = [(r["cls"], r["score"], r["cnt"])
           for r in knn_classify_text(searcher, classes, text, k=k,
                                      min_term_freq=2,
                                      min_doc_freq=5).collect()]

    # --- replay ---
    from collections import Counter
    tfs = Counter(text.split())
    N = oracle.doc_count
    scored = []
    for t in sorted(t for t, f in tfs.items() if f >= 2):
        df = oracle.df(t)
        if df < 5 or df == 0:
            continue
        idf = np.float32(math.log((N + 1) / (df + 1.0)) + 1.0)
        scored.append((float(np.float32(np.float32(tfs[t]) * idf)), t))
    scored.sort(key=lambda p: (-p[0], p[1]))
    kept = scored[:25]
    mn = np.float32(min(s for s, _ in kept))
    clauses = tuple(Q.Term(t, boost=float(np.float32(np.float32(s) / mn)))
                    for s, t in kept)
    hits = oracle.top_k(Q.Or(clauses), k=k)
    mx = np.float32(hits[0][1])
    cls_of = labels
    cnt, bsum = Counter(), Counter()
    for d, s in hits:
        c = cls_of[d]
        cnt[c] += 1
        bsum[c] += float(np.float32(np.float32(s) / mx))
    sumdoc = sum(cnt.values())
    want = []
    for c in cnt:
        sc = (cnt[c] * (bsum[c] / cnt[c])) / float(k)
        if sumdoc < k:
            sc = sc * float(k) / float(sumdoc)
        want.append((c, sc, cnt[c]))
    want.sort(key=lambda r: (-r[1], r[0]))
    assert [(c, n) for c, _, n in got] == [(c, n) for c, _, n in want]
    for (_, gs, _), (_, ws, _) in zip(got, want):
        assert gs == pytest.approx(ws, abs=0)


def _brute_perceptron(corpus, bool_labels, batch_size):
    """Independent replay of BooleanPerceptronClassifier.java:79-215
    with a FULL in-heap weights map + compiled-FST snapshots (the
    reference's own data model), for differential comparison against
    the engine's override-based fit."""
    from lucene_spark.functions.analysis import analyze_text
    doc_toks = {int(d): list(analyze_text(str(t))[0]) for d, t in
                zip(corpus.doc_id, corpus.content)}
    ttf = Counter()
    for toks in doc_toks.values():
        ttf.update(toks)
    n_tokens = sum(ttf.values())
    bias = float(n_tokens) / float(len(doc_toks))
    weights = {t: int(c) for t, c in ttf.items()}
    fst = dict(weights)
    batch_count = 0
    for d in sorted(doc_toks):
        toks = doc_toks[d]
        output = 0
        for t in toks:
            v = fst.get(t)
            if v is not None:
                output += v
        assigned = output >= bias
        correct = bool_labels[d]
        modifier = int(correct) - int(assigned)
        if modifier != 0:
            tfl = Counter(toks)
            for t, f in tfl.items():
                prev = fst.get(t)
                weights[t] = (0 if prev is None
                              else max(0, prev + modifier * f))
            if batch_count % batch_size == 0:
                fst = dict(weights)
        batch_count += 1
    return fst, bias


@pytest.mark.parametrize("batch_size", [1, 3, 10**9])
def test_boolean_perceptron_train_parity(spark, searcher, corpus,
                                         batch_size):
    """Engine fit (term_stats-backed overrides) ≡ full-map replay of the
    reference protocol, including the FST-lag quirks (updates read the
    last COMPILED value; the final model is the last compiled FST)."""
    from lucene_spark.operators.classify import boolean_perceptron_train
    bool_labels = {int(d): (int(d) % 3 == 0) for d in corpus.doc_id}
    want_fst, want_bias = _brute_perceptron(corpus, bool_labels,
                                            batch_size)
    train = spark.createDataFrame(
        [(int(d), str(t), bool_labels[int(d)])
         for d, t in zip(corpus.doc_id, corpus.content)],
        "doc_id long, text string, cls boolean")
    over, bias = boolean_perceptron_train(searcher, train,
                                          batch_size=batch_size,
                                          tokenize="analyzer")
    assert bias == pytest.approx(want_bias, rel=0, abs=0)
    # effective weight per corpus term == the replay's compiled FST
    ttf = Counter()
    from lucene_spark.functions.analysis import analyze_text
    for t in corpus.content:
        ttf.update(analyze_text(str(t))[0])
    got_fst = {t: over.get(t, int(c)) for t, c in ttf.items()}
    assert got_fst == want_fst
    assert set(over) <= set(ttf)  # no phantom terms


def test_boolean_perceptron_classify(spark, searcher, corpus):
    """Distributed assignClass ≡ driver replay: output sum skips unseen
    terms, assigned = output >= bias, score = 1 − exp(−|bias−out|/bias);
    an all-unseen input flows through the left join with output 0."""
    from lucene_spark.operators.classify import (
        boolean_perceptron_classify, boolean_perceptron_train)
    bool_labels = {int(d): (int(d) % 3 == 0) for d in corpus.doc_id}
    train = spark.createDataFrame(
        [(int(d), str(t), bool_labels[int(d)])
         for d, t in zip(corpus.doc_id, corpus.content)],
        "doc_id long, text string, cls boolean")
    model = boolean_perceptron_train(searcher, train, batch_size=2,
                                     tokenize="analyzer")
    fst, bias = _brute_perceptron(corpus, bool_labels, 2)
    texts = {0: str(corpus.content[0]),
             1: "parse token " + str(corpus.content[3]),
             2: "zzzunseen qqqunseen",   # all-unseen → output 0
             3: ""}
    inputs = spark.createDataFrame(sorted(texts.items()),
                                   "input_id long, text string")
    got = {r["input_id"]: (r["output"], r["assigned"], r["score"])
           for r in boolean_perceptron_classify(
               searcher, inputs, model, tokenize="analyzer").collect()}
    from lucene_spark.functions.analysis import analyze_text
    assert set(got) == set(texts)
    for i, tx in texts.items():
        output = 0
        for t in analyze_text(tx)[0]:
            v = fst.get(t)
            if v is not None:
                output += v
        assigned = output >= bias
        score = 1.0 - math.exp(-abs(bias - float(output)) / bias)
        assert got[i][0] == output, i
        assert got[i][1] == assigned, i
        assert got[i][2] == pytest.approx(score, rel=1e-15), i


def _brute_bm25nb(corpus, labels, input_texts):
    """Reference math straight from BM25NBClassifier.java:120-230 —
    per-(word, class) top-1 probes over an OracleIndex, the class field
    modeled as a 1-token keyword field (df = class size, dl = 1,
    avgdl = 1), ReqOptSumScorer float32 clause sum."""
    from lucene_spark.functions.analysis import analyze_text
    from lucene_spark.functions.bm25 import (idf, norm_inverse_cache,
                                             score_block)
    from lucene_spark.functions.smallfloat import int_to_byte4
    idx = OracleIndex.build(
        [(int(d), str(t)) for d, t in zip(corpus.doc_id, corpus.content)])
    classes = sorted(set(labels.values()))
    dwc = len(labels)
    df_c = Counter(labels.values())
    cache1 = norm_inverse_cache(np.float32(1.0))
    nb1 = np.array([int(int_to_byte4(np.array([1]))[0])])
    const = {c: score_block(np.array([1]), nb1,
                            idf(df_c[c], dwc), cache1)[0]
             for c in classes}
    out = {}
    for iid, text in input_texts.items():
        toks = list(analyze_text(text)[0])
        scores = {}
        for c in classes:
            raw = math.log(float(const[c]))            # logPrior
            for w in toks:
                ts = idx._term_scores(w, 1.2, 0.75)
                best = max((float(s) for d, s in ts.items()
                            if labels.get(d) == c), default=0.0)
                raw += math.log(float(const[c] + np.float32(best)))
            scores[c] = raw
        smax = max(scores.values())
        lse = smax + math.log(sum(math.exp(v - smax)
                                  for v in scores.values()))
        out[iid] = {c: math.exp(v - lse) for c, v in scores.items()}
    return out


def test_bm25nb_parity(spark, searcher, corpus, labels, class_df):
    from lucene_spark.operators.classify import bm25nb_classify
    input_texts = {int(d): str(t) for d, t in
                   list(zip(corpus.doc_id, corpus.content))[5:15]}
    inputs = spark.createDataFrame(
        sorted(input_texts.items()), "input_id long, text string")
    scores = bm25nb_classify(searcher, inputs, class_df)
    got = {(r["input_id"], r["cls"]): r["score"] for r in scores.collect()}
    want = _brute_bm25nb(corpus, labels, input_texts)
    assert {i for i, _ in got} == set(input_texts)
    for (i, c), s in got.items():
        assert s == pytest.approx(want[i][c], rel=1e-9), (i, c)
    # normalized: probabilities sum to 1 per input
    sums = Counter()
    for (i, _), s in got.items():
        sums[i] += s
    for i, tot in sums.items():
        assert tot == pytest.approx(1.0, abs=1e-12)
    # argmax parity (ties -> class asc, the reference's stable sort)
    ass = {r["input_id"]: r["cls"]
           for r in assign_class(scores).collect()}
    for i, sc in want.items():
        best = min(sc.items(), key=lambda p: (-p[1], p[0]))[0]
        assert ass[i] == best, i


def test_term_doc_scores(searcher, corpus, labels):
    """term_doc_scores == the engine's own TermQuery score_all, per term."""
    from lucene_spark.operators.classify import term_doc_scores
    terms = ["data", "query", "token"]
    got = term_doc_scores(searcher, terms).collect()
    by_term: dict = {}
    for r in got:
        by_term.setdefault(r["term"], {})[r["doc_id"]] = r["score"]
    for t in terms:
        want = {r["doc_id"]: r["score"]
                for r in searcher.score_all(Q.Term(t)).collect()}
        assert by_term.get(t, {}) == want, t


def test_confusion_matrix_metrics(spark):
    """confusion_matrix/confusion_metrics vs a literal replay of the
    reference's linearized-map loops (ConfusionMatrixGenerator.java:
    188-300), incl. the predicted-only class and the absent-cell tn."""
    from lucene_spark.operators.classify import (confusion_matrix,
                                                 confusion_metrics)
    rows = [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a"),
            ("c", "c"), ("c", "c"), ("a", "a"), ("a", "d"), ("b", "a")]
    df = spark.createDataFrame(rows, "actual string, predicted string")
    mat = confusion_matrix(df)
    got_m = {(r["actual"], r["predicted"]): r["cnt"]
             for r in mat.collect()}
    lin: dict = {}
    for a, p in rows:
        lin.setdefault(a, {})
        lin[a][p] = lin[a].get(p, 0) + 1
    assert got_m == {(a, p): c for a, d in lin.items()
                     for p, c in d.items()}

    def prec(k):
        tp = lin.get(k, {}).get(k, 0)
        den = sum(v[k] for v in lin.values() if k in v)
        return tp / den if tp > 0 else 0.0

    def rec(k):
        row = lin.get(k, {})
        tp = row.get(k, 0)
        fn = sum(v for kk, v in row.items() if kk != k)
        return tp / (tp + fn) if tp + fn > 0 else 0.0

    P = sum(prec(k) for k in lin) / len(lin)
    R = sum(rec(k) for k in lin) / len(lin)
    F1 = 2 * P * R / (P + R) if P > 0 and R > 0 else 0.0
    tp = tn = tfp = fn = 0.0
    for k, row in lin.items():
        for kk, v in row.items():
            if kk == k:
                tp += v
            else:
                fn += v
        for vals in lin.values():
            if k in vals:
                tfp += vals[k]
            else:
                tn += 1
    acc = (tp + tn) / (tfp + fn + tn)
    got = confusion_metrics(mat).collect()[0]
    assert got["accuracy"] == pytest.approx(acc, rel=1e-12)
    assert got["precision"] == pytest.approx(P, rel=1e-12)
    assert got["recall"] == pytest.approx(R, rel=1e-12)
    assert got["f1"] == pytest.approx(F1, rel=1e-12)
    assert got["n_docs"] == len(rows)


@pytest.mark.parametrize("test_ratio,cv_ratio",
                         [(0.2, 0.0), (0.3, 0.15), (0.5, 0.5), (0.0, 0.25)])
def test_dataset_split_parity(spark, test_ratio, cv_ratio):
    """dataset_split vs a literal replay of DatasetSplitter.java:134-162
    (global alternating b, per-class float-compared quota counters,
    classes in first-doc order)."""
    from lucene_spark.operators.classify import dataset_split
    n = 137
    labels = {d: f"c{(d * 7) % 5}" for d in range(n)}
    df = spark.createDataFrame(sorted(labels.items()),
                               "doc_id long, cls string")
    got = {r["doc_id"]: r["split"]
           for r in dataset_split(df, test_ratio=test_ratio,
                                  cv_ratio=cv_ratio).collect()}
    # brute sequential replay
    classes: list = []
    for d in range(n):
        if labels[d] not in classes:
            classes.append(labels[d])
    want = {}
    b = 0
    for c in classes:
        docs_c = [d for d in range(n) if labels[d] == c]
        ts, cs = len(docs_c) * test_ratio, len(docs_c) * cv_ratio
        tc = cvc = 0
        for d in docs_c:
            if b % 2 == 0 and tc < ts:
                want[d] = "test"
                tc += 1
            elif cvc < cs:
                want[d] = "cv"
                cvc += 1
            else:
                want[d] = "train"
            b += 1
    assert got == want


@pytest.fixture(scope="module")
def fields_corpus(corpus):
    # title = first 4 whitespace tokens, body = the rest (every corpus
    # doc is long enough that both fields are non-empty)
    titles, bodies = [], []
    for t in corpus.content:
        toks = str(t).split()
        titles.append(" ".join(toks[:4]))
        bodies.append(" ".join(toks[4:]))
    return titles, bodies


@pytest.fixture(scope="module")
def searchers_tb(spark, corpus, fields_corpus):
    titles, bodies = fields_corpus
    base = tempfile.mkdtemp(prefix="lucene_spark_docclf_")
    out = []
    for name, vals in (("title", titles), ("body", bodies)):
        df = spark.createDataFrame(
            [(int(d), v) for d, v in zip(corpus.doc_id, vals)],
            "doc_id long, content string")
        build_index(spark, df, base + "/" + name, num_segments=4)
        out.append(Searcher(spark, base + "/" + name))
    return out


def test_nb_document_parity(spark, searchers_tb, corpus, fields_corpus,
                            labels, class_df):
    """naive_bayes_classify_document vs a replay of
    SimpleNaiveBayesDocumentClassifier.java:106-214 — per-field stats,
    token-count-normalized log-likelihood, field boosts, softmax."""
    from lucene_spark.functions.analysis import analyze_text
    from lucene_spark.operators.classify import (
        assign_class, naive_bayes_classify_document)
    titles, bodies = fields_corpus
    s_title, s_body = searchers_tb
    n_inputs = 10
    inputs = spark.createDataFrame(
        [(int(d), titles[i], bodies[i])
         for i, d in enumerate(corpus.doc_id) if i < n_inputs],
        "input_id long, title_text string, body_text string")
    boosts = (2.0, 1.0)
    scores = naive_bayes_classify_document(
        [(s_title, "title_text", boosts[0]),
         (s_body, "body_text", boosts[1])], inputs, class_df)
    got = {(r["input_id"], r["cls"]): r["score"] for r in scores.collect()}

    # --- replay ---
    classes = sorted(set(labels.values()))
    dwc = len(labels)
    df_c = Counter(labels.values())
    raws: dict = {}
    for vals, boost in ((titles, boosts[0]), (bodies, boosts[1])):
        doc_toks = {int(d): list(analyze_text(vals[i])[0])
                    for i, d in enumerate(corpus.doc_id)}
        hits: Counter = Counter()
        for d, toks in doc_toks.items():
            for w in set(toks):
                hits[(w, labels[d])] += 1
        sum_df = sum(len(set(t)) for t in doc_toks.values())
        avg_u = sum_df / len(doc_toks)
        for i, d in enumerate(corpus.doc_id):
            if i >= n_inputs:
                break
            toks = list(analyze_text(vals[i])[0])
            for c in classes:
                lik = sum(math.log((hits[(w, c)] + 1)
                                   / (avg_u * df_c[c] + dwc))
                          for w in toks)
                contrib = (math.log(df_c[c]) - math.log(dwc)
                           + boost * lik / len(toks))
                raws[(int(d), c)] = raws.get((int(d), c), 0.0) + contrib
    want = {}
    for i, d in enumerate(corpus.doc_id):
        if i >= n_inputs:
            break
        sc = {c: raws[(int(d), c)] for c in classes}
        smax = max(sc.values())
        lse = smax + math.log(sum(math.exp(v - smax) for v in sc.values()))
        for c, v in sc.items():
            want[(int(d), c)] = math.exp(v - lse)
    for key, s in got.items():
        assert s == pytest.approx(want[key], rel=1e-9), key
    ass = {r["input_id"]: r["cls"] for r in assign_class(scores).collect()}
    for i in ass:
        best = min(((c, want[(i, c)]) for c in classes),
                   key=lambda p: (-p[1], p[0]))[0]
        assert ass[i] == best, i


def test_knn_document_parity(spark, searchers_tb, corpus, fields_corpus,
                             labels, class_df):
    """knn_classify_document vs a replay of
    KNearestNeighborDocumentClassifier.java:91-141 over per-field
    OracleIndexes: per-field boosted-MLT float scores, double-summed,
    class-exists filter, shared KNN vote."""
    from lucene_spark.operators.classify import knn_classify_document
    from lucene_spark.plans import query as Q
    titles, bodies = fields_corpus
    s_title, s_body = searchers_tb
    seed = 7
    doc_fields = [(s_title, titles[seed], 2.0), (s_body, bodies[seed], 1.0)]
    k = 10
    got = [(r["cls"], r["score"], r["cnt"])
           for r in knn_classify_document(doc_fields, class_df, k=k,
                                          min_term_freq=2,
                                          min_doc_freq=5).collect()]

    # --- replay ---
    totals: dict = {}
    for vals, text, bf in ((titles, titles[seed], 2.0),
                           (bodies, bodies[seed], 1.0)):
        oracle = OracleIndex.build(
            [(int(d), vals[i]) for i, d in enumerate(corpus.doc_id)])
        tfs = Counter(text.split())
        N = oracle.doc_count
        scored = []
        for t in sorted(t for t, f in tfs.items() if f >= 2):
            df = oracle.df(t)
            if df < 5 or df == 0:
                continue
            idf = np.float32(math.log((N + 1) / (df + 1.0)) + 1.0)
            scored.append((float(np.float32(np.float32(tfs[t]) * idf)), t))
        scored.sort(key=lambda p: (-p[0], p[1]))
        kept = scored[:25]
        if not kept:
            continue
        mn = np.float32(min(s for s, _ in kept))
        clauses = tuple(
            Q.Term(t, boost=float(np.float32(
                np.float32(np.float32(bf) * np.float32(s)) / mn)))
            for s, t in kept)
        for d, s in oracle.top_k(Q.Or(clauses), k=len(labels)):
            totals[d] = totals.get(d, 0.0) + float(s)
    hits = sorted(((d, np.float32(s)) for d, s in totals.items()),
                  key=lambda p: (-p[1], p[0]))[:k]
    mx = np.float32(hits[0][1])
    cnt, bsum = Counter(), Counter()
    for d, s in hits:
        c = labels[d]
        cnt[c] += 1
        bsum[c] += float(np.float32(np.float32(s) / mx))
    sumdoc = sum(cnt.values())
    want = []
    for c in cnt:
        sc = (cnt[c] * (bsum[c] / cnt[c])) / float(k)
        if sumdoc < k:
            sc = sc * float(k) / float(sumdoc)
        want.append((c, sc, cnt[c]))
    want.sort(key=lambda r: (-r[1], r[0]))
    assert [(c, n) for c, _, n in got] == [(c, n) for c, _, n in want]
    for (_, gs, _), (_, ws, _) in zip(got, want):
        assert gs == pytest.approx(ws, abs=0)


def test_doc_to_double_vectors(spark, corpus):
    """DocToDoubleVectorUtils sparse/dense freq vectors vs analyze_text
    recounts (reference classification/utils/DocToDoubleVectorUtils
    .java:37-92)."""
    from lucene_spark.functions.analysis import analyze_text
    from lucene_spark.operators.classify import doc_to_double_vectors
    d = tempfile.mkdtemp(prefix="lucene_spark_d2v_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4,
                store_term_vectors=True)
    s = Searcher(spark, d)
    ids = spark.createDataFrame([(0,), (3,), (7,)], "doc_id long")
    want = {}
    for doc_id in (0, 3, 7):
        toks = list(analyze_text(str(corpus.content[doc_id]))[0])
        want[doc_id] = Counter(toks)
    sparse = {r["doc_id"]: (list(r["terms"]), list(r["vector"]))
              for r in doc_to_double_vectors(s, ids).collect()}
    for doc_id, cnt in want.items():
        terms, vec = sparse[doc_id]
        assert terms == sorted(cnt)
        assert vec == [float(cnt[t]) for t in terms]
    dense = {r["doc_id"]: np.array(r["vector"])
             for r in doc_to_double_vectors(s, ids, dense=True).collect()}
    vocab = sorted({t for c in want.values() for t in c}
                   | {r["term"] for r in
                      s.term_stats.select("term").limit(0).collect()})
    full_vocab = [r["term"] for r in
                  s.term_stats.select("term").orderBy("term").collect()]
    for doc_id, cnt in want.items():
        v = dense[doc_id]
        assert len(v) == len(full_vocab)
        for t, c in cnt.items():
            assert v[full_vocab.index(t)] == float(c)
        assert v.sum() == float(sum(cnt.values()))
