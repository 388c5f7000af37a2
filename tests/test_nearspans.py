"""NearSpansOrdered/Unordered ports vs the reference's own iterators:
tests/data/lucene_diff/spans_fuzz.tsv.gz holds every span (start, end,
width) the compiled reference emitted for 120 random SpanNear queries
over 400 random multi-occurrence docs (incl. posInc-0 same-position
ties where the unordered heap's tie order matters). The ports must
replay every span exactly, in order."""

import gzip
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "lucene_diff",
                      "spans_fuzz.tsv.gz")


def _load():
    docs = {}
    queries = []
    with gzip.open(GOLDEN, "rt", encoding="utf-8") as f:
        for line in f:
            p = line.rstrip("\n").split("\t")
            if p[0] == "DOCPOS":
                pm = {}
                for item in p[2:]:
                    t, v = item.split("=")
                    pm[t] = [int(x) for x in v.split(",")]
                docs[int(p[1])] = pm
            elif p[0].startswith("QUERY"):
                head = p[0].split(" ")
                slop = int(head[1])
                ordered = head[2] == "o"
                terms = head[3:]
                spans = []
                for h in p[1:]:
                    d, s, e, w = h.split(":")
                    spans.append((int(d), int(s), int(e), int(w)))
                queries.append((slop, ordered, terms, spans))
    return docs, queries


def test_ports_replay_reference_spans_exactly():
    from lucene_spark.functions.nearspans import (ordered_near_spans,
                                                  unordered_near_spans)
    docs, queries = _load()
    assert len(queries) > 100
    bad = 0
    total_spans = 0
    for slop, ordered, terms, exp in queries:
        got = []
        for did in sorted(docs):
            pm = docs[did]
            pls = [pm.get(t, []) for t in terms]
            if any(not p for p in pls):
                continue
            fn = ordered_near_spans if ordered else unordered_near_spans
            for s, e, w in fn(pls, slop):
                got.append((did, s, e, w))
        total_spans += len(exp)
        if got != exp:
            bad += 1
            if bad <= 3:
                ldiff = next(i for i in range(max(len(got), len(exp)))
                             if i >= len(got) or i >= len(exp)
                             or got[i] != exp[i])
                print("MISMATCH", slop, ordered, terms, "at", ldiff,
                      got[ldiff:ldiff + 3], exp[ldiff:ldiff + 3])
    assert bad == 0, f"{bad} of {len(queries)} queries diverge"
    assert total_spans > 5000
