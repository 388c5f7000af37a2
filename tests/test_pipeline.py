"""Tests for the training-data pipeline operators (dedup, simsearch,
textstats, multimodal) and the engine additions they build on."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from lucene_spark.pipeline import dedup, multimodal, simsearch, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy cat", "en"),   # near-dup of 0
        (2, "der hund und die katze und der vogel sind da", "de"),
        (3, "completely different text about spark engines here", "en"),
        (4, "the quick brown fox jumps over the lazy dog", "en"),   # exact dup of 0
        (5, "el gato y el perro de la casa que corre", "es"),
        (6, "short text", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def test_exact_dedup(spark, docs):
    groups = dedup.exact_duplicate_groups(docs).toPandas()
    assert len(groups) == 6  # 7 docs, one exact pair
    dup = groups[groups.cnt == 2]
    assert len(dup) == 1 and dup.iloc[0]["keeper"] == 0
    survivors = dedup.drop_exact_duplicates(docs).toPandas()
    assert sorted(survivors.doc_id) == [0, 1, 2, 3, 5, 6]


def test_ngram_jaccard_finds_near_dups(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5).toPandas()
    got = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert (0, 4) in got          # exact dup -> jaccard 1.0
    assert (0, 1) in got and (1, 4) in got  # near-dups share most trigrams
    assert all(a != 3 and b != 3 for a, b in got)


def test_minhash_matches_bruteforce_at_high_threshold(spark, docs):
    brute = dedup.ngram_jaccard_pairs(docs, threshold=0.7).toPandas()
    lsh = dedup.minhash_near_duplicates(docs, threshold=0.7).toPandas()
    bset = {(a, b) for a, b in zip(brute.id_a, brute.id_b)}
    lset = {(a, b) for a, b in zip(lsh.id_a, lsh.id_b)}
    assert lset <= bset           # LSH output verified exactly -> no false pos
    assert (0, 4) in lset         # identical docs always collide
    # jaccard values agree where both report the pair
    merged = brute.merge(lsh, on=["id_a", "id_b"], suffixes=("_b", "_l"))
    assert np.allclose(merged.jaccard_b, merged.jaccard_l)


def test_simhash_properties(spark, docs):
    sigs = dedup.simhash_signatures(docs).toPandas().set_index("doc_id")
    # identical text -> identical signature
    assert sigs.loc[0, "simhash_hi"] == sigs.loc[4, "simhash_hi"]
    assert sigs.loc[0, "simhash_lo"] == sigs.loc[4, "simhash_lo"]

    def ham(a, b):
        return (bin(int(sigs.loc[a, "simhash_hi"]) ^ int(sigs.loc[b, "simhash_hi"])).count("1")
                + bin(int(sigs.loc[a, "simhash_lo"]) ^ int(sigs.loc[b, "simhash_lo"])).count("1"))

    assert ham(0, 4) == 0
    assert ham(0, 1) < ham(0, 3)  # near-dup closer than unrelated doc
    pairs = dedup.simhash_near_duplicates(docs, max_hamming=0).toPandas()
    assert {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)} == {(0, 4)}


# ---------------------------------------------------------------------------
# simsearch
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 16).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(60, dtype=np.int64),
                        "embedding": [v.tolist() for v in vecs]})
    return spark.createDataFrame(pdf), vecs


def test_brute_force_topk_matches_numpy(spark, vectors):
    emb_df, vecs = vectors
    from pyspark.sql import functions as F
    res = simsearch.brute_force_topk(
        emb_df, emb_df.where(F.col("vec_id") < 3), k=4).toPandas()
    norms = vecs.astype(np.float64)
    norms = norms / np.linalg.norm(norms, axis=1, keepdims=True)
    sims = norms @ norms.T
    for q in range(3):
        order = [(-float(sims[q, j]), j) for j in range(60) if j != q]
        expect = [j for _, j in sorted(order)[:4]]
        got = res[res.query_id == q].sort_values("rank").neighbor_id.tolist()
        assert got == expect, f"query {q}: {got} != {expect}"


def test_lsh_topk_recall(spark, vectors):
    emb_df, _ = vectors
    from pyspark.sql import functions as F
    q = emb_df.where(F.col("vec_id") < 10)
    brute = simsearch.brute_force_topk(emb_df, q, k=3).toPandas()
    approx = simsearch.lsh_bucketed_topk(emb_df, q, k=3,
                                         num_planes=3, dim=16).toPandas()
    bpairs = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
    apairs = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(bpairs & apairs) / len(bpairs)
    assert recall >= 0.5  # multiprobe over 3 planes covers most neighbors


def test_ivf_full_probe_matches_bruteforce(spark, vectors):
    """nprobe == num_centroids ⇒ IVF is exhaustive ⇒ identical to brute
    force (ranks and cosines) — the IVF differential-test hook."""
    emb_df, _ = vectors
    from pyspark.sql import functions as F
    q = emb_df.where(F.col("vec_id") < 5)
    brute = simsearch.brute_force_topk(emb_df, q, k=4).toPandas()
    full = simsearch.ivf_topk(emb_df, q, k=4, num_centroids=8, nprobe=8,
                              iters=1).toPandas()
    bkey = brute.sort_values(["query_id", "rank"])
    fkey = full.sort_values(["query_id", "rank"])
    assert bkey.neighbor_id.tolist() == fkey.neighbor_id.tolist()
    assert np.allclose(bkey.cos.to_numpy(), fkey.cos.to_numpy())


def test_filtered_topk(spark, vectors):
    """Pre-filtered KNN (KnnFloatVectorQuery(filter) role): every result
    satisfies the filter, and nprobe == C on the filtered corpus equals
    brute force over the filtered subset exactly."""
    emb_df, _ = vectors
    from pyspark.sql import functions as F
    allowed = emb_df.where(F.col("vec_id") % 3 == 0) \
                    .select(F.col("vec_id").alias("doc_id"))
    q = emb_df.where(F.col("vec_id") < 5)
    got = simsearch.filtered_topk(emb_df, q, k=4, allowed=allowed,
                                  method="ivf", num_centroids=6, nprobe=6,
                                  iters=1).toPandas()
    assert set(got.neighbor_id) <= {i for i in range(60) if i % 3 == 0}
    brute = simsearch.filtered_topk(emb_df, q, k=4, allowed=allowed,
                                    method="brute").toPandas()
    g = got.sort_values(["query_id", "rank"])
    b = brute.sort_values(["query_id", "rank"])
    assert g.neighbor_id.tolist() == b.neighbor_id.tolist()
    assert np.allclose(g.cos.to_numpy(), b.cos.to_numpy())
    # filter integrates with the boolean engine: matching_docs output shape
    # (doc_id column) is exactly what `allowed` consumes — covered e2e by
    # the knn_filtered_topk driver entry.


def test_ivf_partial_probe_recall(spark, vectors):
    emb_df, _ = vectors
    from pyspark.sql import functions as F
    q = emb_df.where(F.col("vec_id") < 10)
    brute = simsearch.brute_force_topk(emb_df, q, k=3).toPandas()
    approx = simsearch.ivf_topk(emb_df, q, k=3, num_centroids=8,
                                nprobe=3, iters=2).toPandas()
    bpairs = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
    apairs = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    assert len(bpairs & apairs) / len(bpairs) >= 0.5


@pytest.fixture(scope="module")
def near_dup_vectors(spark):
    """40 random base vectors + 8 planted clones (tiny noise) of bases
    0..7 → the true near-dup pairs at cos >= 0.99 are (i, 40+i)."""
    rng = np.random.RandomState(11)
    base = rng.randn(40, 16).astype(np.float64)
    clones = base[:8] + 0.01 * rng.randn(8, 16)
    vecs = np.vstack([base, clones]).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(48, dtype=np.int64),
                        "embedding": [v.tolist() for v in vecs]})
    return spark.createDataFrame(pdf), vecs


def test_cosine_near_duplicates_exact(spark, near_dup_vectors):
    df, vecs = near_dup_vectors
    out = simsearch.cosine_near_duplicates(df, 0.99).toPandas()
    got = {(int(a), int(b)) for a, b in zip(out.id_a, out.id_b)}
    assert got == {(i, 40 + i) for i in range(8)}
    assert (out.cos >= 0.99).all()


def test_cosine_near_duplicates_lsh_recall(spark, near_dup_vectors):
    df, _ = near_dup_vectors
    exact = simsearch.cosine_near_duplicates(df, 0.99).toPandas()
    lsh = simsearch.cosine_near_duplicates_lsh(
        df, 0.99, num_planes=6, dim=16).toPandas()
    epairs = {(int(a), int(b)) for a, b in zip(exact.id_a, exact.id_b)}
    lpairs = {(int(a), int(b)) for a, b in zip(lsh.id_a, lsh.id_b)}
    assert lpairs <= epairs          # verification is exact ⇒ precision 1
    assert len(lpairs) / len(epairs) >= 0.75  # near-identical vectors
    # agree on almost every sign bit; multiprobe covers 1-bit misses


# ---------------------------------------------------------------------------
# textstats
# ---------------------------------------------------------------------------

def test_token_counts_and_quality(spark, docs):
    out = textstats.with_quality_score(
        textstats.with_token_counts(docs)).toPandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 9
    assert out.loc[0, "n_distinct"] == 8  # 'the' twice
    # BPE-ish pre-tokenization: pure word text → same count as whitespace
    assert out.loc[0, "n_subtokens"] == 9
    assert ((out.quality >= 0) & (out.quality <= 1)).all()
    assert out.loc[3, "quality"] > out.loc[0, "quality"]  # no stopword spam
    # mixed word/digit/symbol runs split into separate subtokens
    mixed = spark.createDataFrame([(0, "foo123+bar", "en")],
                                  "doc_id long, text string, lang string")
    m = textstats.with_token_counts(mixed).toPandas()
    assert int(m.loc[0, "n_tokens"]) == 1
    assert int(m.loc[0, "n_subtokens"]) == 4  # foo | 123 | + | bar


def test_lang_id(spark, docs):
    out = textstats.with_lang_id(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[2, "lang_pred"] == "de"
    assert out.loc[5, "lang_pred"] == "es"


def test_fingerprints(spark, docs):
    out = textstats.with_fingerprints(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "fp_exact"] == hashlib.md5(
        b"the quick brown fox jumps over the lazy dog").hexdigest()
    assert out.loc[0, "fp_exact"] == out.loc[4, "fp_exact"]
    assert out.loc[0, "fp_bag"] == out.loc[4, "fp_bag"]
    assert out.loc[0, "fp_bag"] != out.loc[1, "fp_bag"]
    # rolling-hash fingerprint: min over 8-char window md5s — exact dups
    # share it, and python recomputation matches
    t = "the quick brown fox jumps over the lazy dog"
    want = min(hashlib.md5(t[i:i + 8].encode()).hexdigest()
               for i in range(len(t) - 7))
    assert out.loc[0, "fp_roll"] == want == out.loc[4, "fp_roll"]


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

def test_multimodal_meta_and_fake_decode(spark, docs):
    with_payload = multimodal.attach_payload(docs)
    meta = multimodal.extract_meta(with_payload).toPandas().set_index("doc_id")
    assert meta.loc[6, "payload_len"] == len(b"short text")
    assert meta.loc[6, "payload_md5"] == hashlib.md5(b"short text").hexdigest()

    feats = multimodal.decode_features(with_payload, fake=True).toPandas()
    assert len(feats) == 7
    assert all(len(f) == multimodal.FEATURE_DIM for f in feats.features)
    # deterministic: same payload -> same features
    f0 = feats[feats.doc_id == 0].features.iloc[0]
    f4 = feats[feats.doc_id == 4].features.iloc[0]
    assert np.allclose(list(f0), list(f4))


def test_multimodal_real_decode_is_stubbed(spark, docs):
    from py4j.protocol import Py4JJavaError
    feats = multimodal.decode_features(multimodal.attach_payload(docs),
                                       fake=False)
    with pytest.raises(Exception) as ei:
        feats.collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, Py4JJavaError)


def test_ivf_sampled_training_recall(spark):
    """Sampled IVF training: Lloyd iterations scan a deterministic hash
    subset; full-probe search over the resulting lists stays EXACT (it
    is brute force with partition pruning off), and the sampled
    centroids keep usable recall at nprobe=4."""
    import numpy as np

    from lucene_spark.pipeline import simsearch

    rng = np.random.default_rng(31)
    n, dim = 400, 16
    vecs = rng.normal(size=(n, dim)).astype("float32")
    corpus = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(5)],
        "vec_id long, embedding array<float>")
    cents_full = simsearch.ivf_centroids(corpus, 8, iters=1)
    cents_samp = simsearch.ivf_centroids(corpus, 8, iters=1,
                                         train_fraction=0.5)
    assert cents_full.shape == cents_samp.shape == (8, dim)
    # deterministic: same call twice gives identical centroids
    again = simsearch.ivf_centroids(corpus, 8, iters=1, train_fraction=0.5)
    assert np.array_equal(cents_samp, again)
    # full-probe with sampled centroids == brute force top-k
    brute = simsearch.brute_force_topk(corpus, queries, k=5)
    got = simsearch.ivf_topk(corpus, queries, k=5, num_centroids=8,
                              nprobe=8, iters=1, train_fraction=0.5)
    b = {(r["query_id"], r["rank"]): r["neighbor_id"]
         for r in brute.collect()}
    g = {(r["query_id"], r["rank"]): r["neighbor_id"]
         for r in got.collect()}
    assert b == g


def test_contamination(spark):
    """Decontamination: docs sharing >= min_hits n-gram shingles with
    the benchmark set are flagged and dropped — vs a brute set twin."""
    from lucene_spark.pipeline.contamination import (contamination_flags,
                                                     decontaminate)

    def sh(text, n=4):
        toks = text.lower().split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    docs = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "totally unrelated content goes right here"),
        (2, "prefix words then beta gamma delta epsilon tail"),
        (3, "gamma delta epsilon zeta eta theta"),
        (4, "short doc"),
    ]
    bench = [(100, "x beta gamma delta epsilon y"),
             (101, "short doc")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    got = {r["doc_id"]: r["hits"] for r in
           contamination_flags(ddf, bdf, n=4).collect()}
    bench_sh = set().union(*(sh(t, 4) for _, t in bench))
    want = {}
    for d, t in docs:
        hits = len(sh(t, 4) & bench_sh)
        if hits >= 1:
            want[d] = hits
    assert got == want and 0 in got and 4 in got and 1 not in got
    survivors = sorted(r["doc_id"] for r in
                       decontaminate(ddf, bdf, n=4).collect())
    assert survivors == sorted(set(d for d, _ in docs) - set(want))
    # min_hits threshold
    strict = {r["doc_id"] for r in
              contamination_flags(ddf, bdf, n=4, min_hits=3).collect()}
    assert strict == {d for d, h in want.items() if h >= 3}


def test_redact_pii(spark):
    """PII redaction: emails/IPs/phones replaced with placeholders, per-
    kind counts recorded; clean text untouched."""
    from lucene_spark.pipeline.redact import redact_pii

    rows = [
        (0, "contact bob.smith+x@example.co.uk or 192.168.0.1 now"),
        (1, "call (555) 123-4567 or +44 555 123 4567 today"),
        (2, "perfectly clean text with numbers 12345 and 3.14"),
        (3, "a@b.io a@b.io twice and 10.0.0.255"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}
    assert out[0]["text"] == "contact <EMAIL> or <IP> now"
    assert out[0]["n_email"] == 1 and out[0]["n_ip"] == 1
    assert "<PHONE>" in out[1]["text"] and out[1]["n_phone"] >= 2
    assert "555" not in out[1]["text"]
    assert out[2]["text"] == rows[2][1]
    assert out[2]["n_email"] == out[2]["n_ip"] == out[2]["n_phone"] == 0
    assert out[3]["text"].count("<EMAIL>") == 2 and out[3]["n_email"] == 2
    assert out[3]["text"].count("<IP>") == 1
    # selective kinds + separate out column
    only_mail = redact_pii(df, kinds=("EMAIL",), out_col="clean") \
        .filter("doc_id = 0").collect()[0]
    assert only_mail["clean"] == "contact <EMAIL> or 192.168.0.1 now"
    assert only_mail["text"] == rows[0][1]


def test_shard_assignment(spark, tmp_path):
    """Two-pass distributed cumsum sharding: exact global token offsets
    in doc_id order (vs a single-machine cumsum), stable shard ids,
    partitioned write round-trips."""
    import numpy as np

    from lucene_spark.pipeline.shard import assign_shards, write_shards
    from lucene_spark.sources.corpus import generate_corpus

    pdf = generate_corpus(300, seed=71).rename(columns={"content": "text"})
    df = spark.createDataFrame(pdf[["doc_id", "text"]])
    got = (assign_shards(df, tokens_per_shard=5000, num_partitions=7)
           .orderBy("doc_id")
           .select("doc_id", "n_tokens", "token_offset", "shard_id")
           .toPandas())
    ref = pdf.sort_values("doc_id").reset_index(drop=True)
    n_tokens = ref.text.str.split(" ").str.len().to_numpy()
    offsets = np.concatenate(([0], np.cumsum(n_tokens)[:-1]))
    assert (got.doc_id.to_numpy() == ref.doc_id.to_numpy()).all()
    assert (got.n_tokens.to_numpy() == n_tokens).all()
    assert (got.token_offset.to_numpy() == offsets).all()
    assert (got.shard_id.to_numpy() == offsets // 5000).all()
    assert got.shard_id.nunique() > 1
    # determinism across partition counts
    got3 = (assign_shards(df, 5000, num_partitions=3)
            .orderBy("doc_id").select("token_offset").toPandas())
    assert (got3.token_offset.to_numpy() == offsets).all()
    # partitioned write round-trips with the same assignment
    out = str(tmp_path / "shards")
    write_shards(df, out, 5000, num_partitions=4)
    back = spark.read.parquet(out).orderBy("doc_id") \
        .select("doc_id", "shard_id").toPandas()
    assert (back.shard_id.to_numpy() == offsets // 5000).all()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        assign_shards(df, 0)


def test_mixture_sampling(spark):
    """Deterministic domain mixing: rates realize the recipe at the
    largest feasible total (binding domain keeps all), selection is the
    md5 cut — vs a brute twin."""
    import hashlib

    import pytest as _pytest

    from lucene_spark.pipeline.mix import mixture_rates, sample_to_mixture

    rows = []
    for i in range(300):
        dom = "web" if i % 3 else "code"          # web ≈ 2x code docs
        rows.append((i, dom, "tok " * (5 + i % 7)))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    w = {"web": 0.5, "code": 0.5}
    rates = mixture_rates(df, w)
    toks = {}
    for i, dom, t in rows:
        toks[dom] = toks.get(dom, 0) + len(t.split(" "))
    t_star = min(toks[d] / wd for d, wd in w.items())
    for d in w:
        assert rates[d] == _pytest.approx(w[d] * t_star / toks[d])
    assert max(rates.values()) == _pytest.approx(1.0)   # binding domain
    kept = {r["doc_id"] for r in sample_to_mixture(df, w).collect()}
    cuts = {d: ("g" if r >= 1.0 else format(int(r * 16**8), "08x"))
            for d, r in rates.items()}
    want = {i for i, dom, _ in rows
            if hashlib.md5(str(i).encode()).hexdigest()[:8] < cuts[dom]}
    assert kept == want and 0 < len(kept) < len(rows)
    with _pytest.raises(ValueError):
        mixture_rates(df, {"web": 0.7})               # doesn't sum to 1
    with _pytest.raises(ValueError):
        mixture_rates(df, {"web": 0.5, "papers": 0.5})  # absent domain
def test_repetition_stats(spark):
    """Gopher-style repetition signals vs brute counting."""
    from collections import Counter

    import pytest as _pytest

    from lucene_spark.pipeline.repetition import repetition_stats

    rows = [
        (0, "a b c a b c a b c"),          # heavy 3-gram repetition
        (1, "all words unique here now"),
        (2, "x y"),                         # shorter than n
        (3, "p q r p q r s t u"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in repetition_stats(df, n=3).collect()}
    for d, t in rows:
        toks = t.lower().split()
        grams = ([" ".join(toks[i:i + 3])
                  for i in range(len(toks) - 2)]
                 if len(toks) >= 3 else [" ".join(toks)])
        c = Counter(grams)
        dup = sum(v for v in c.values() if v > 1) / len(grams)
        top = max(c.values()) / len(grams)
        assert got[d]["dup_3gram_frac"] == _pytest.approx(dup), d
        assert got[d]["top_3gram_frac"] == _pytest.approx(top), d
    assert got[0]["dup_3gram_frac"] > 0.9 and got[1]["dup_3gram_frac"] == 0


def test_connected_components_shapes(spark):
    """Large-star/small-star CC vs per-case ground truth: chains, stars,
    cycles, disjoint pairs, cross-component id interleaving."""
    from lucene_spark.pipeline.dedup import connected_components

    pairs = [(1, 2), (2, 3), (3, 4),          # chain -> root 1
             (10, 12), (10, 11), (10, 13),    # star -> root 10
             (20, 21), (21, 22), (22, 20),    # cycle -> root 20
             (30, 31),                        # pair -> root 30
             (5, 40), (40, 6)]                # interleaved ids -> root 5
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {(r["node"], r["root"])
           for r in connected_components(df).collect()}
    want = {(n, 1) for n in (1, 2, 3, 4)} \
        | {(n, 10) for n in (10, 11, 12, 13)} \
        | {(n, 20) for n in (20, 21, 22)} \
        | {(n, 30) for n in (30, 31)} \
        | {(n, 5) for n in (5, 6, 40)}
    assert got == want


def test_drop_near_duplicates_transitive(spark):
    """Cluster-level dedup keeps ONE doc per near-dup component, even
    across transitive links (a~b, b~c with a!~c)."""
    import pandas as pd

    from lucene_spark.pipeline.dedup import (drop_near_duplicates,
                                             minhash_near_duplicates)

    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [base + "one two three",
                 base + "one two four",      # near-dup of 0
                 base + "one five four",     # near-dup of 1, farther from 0
                 "completely different short text entirely"],
    })
    df = spark.createDataFrame(docs)
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_near_duplicates(df, threshold=0.8).collect()}
    assert pairs  # the fixture must actually produce near-dups
    kept = sorted(r["doc_id"] for r in
                  drop_near_duplicates(df, threshold=0.8).collect())
    # one survivor (the min id) from the dup component + the outlier
    comp = set()
    for a, b in pairs:
        comp |= {a, b}
    assert kept == sorted(({min(comp)} | {0, 1, 2, 3} - comp))


def test_fingerprint_token_goldens_and_spark(spark):
    """FingerprintFilter (miscellaneous/FingerprintFilter.java; goldens
    from TestFingerprintFilter.java) — Python twin exact, Spark
    expression chain ≡ twin on mixed shapes incl. empty and
    over-budget docs."""
    from lucene_spark.pipeline.textstats import (fingerprint_token,
                                                 with_fingerprint_token)
    assert fingerprint_token("B A B E".split()) == "A B E"
    assert fingerprint_token("B2 B2".split()) == "B2"
    assert fingerprint_token("B2 A1 C3 D4 E5 F6 G7 H1".split(), 4) is None
    assert fingerprint_token("B2 A1 C3 B2".split(), 1024, "_") == "A1_B2_C3"
    assert fingerprint_token(["A1"]) == "A1"
    assert fingerprint_token([]) is None
    assert fingerprint_token(["ab", "c"], 4) == "ab c"  # == max emits

    rows = [(0, "B A B E"), (1, ""), (2, "B2 A1 C3 D4 E5 F6 G7 H1"),
            (3, "one  two   one")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["fingerprint"] for r in
           with_fingerprint_token(df, max_output_token_size=10)
           .collect()}
    want = {d: fingerprint_token([w for w in t.split(" ") if w], 10)
            for d, t in rows}
    assert got == want
