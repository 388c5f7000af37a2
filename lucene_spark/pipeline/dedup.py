"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All four are expressed with built-in DataFrame operators so Catalyst keeps
pushdown/pruning and every aggregation gets map-side partial combine.

Scale design (100 TB corpora):

* **exact** — one shuffle on ``md5(text)``; hash keys are uniform, so no
  skew by construction.
* **MinHash + LSH** — the scale path for near-dup: per-doc signatures are
  one groupBy over (doc, shingle) pairs with H ``min`` aggregates (map-side
  combined); candidate generation shuffles on (band, signature), whose
  groups are tiny by design (only near-identical docs collide); exact
  Jaccard verification touches only candidate pairs. Nothing is quadratic.
* **n-gram Jaccard (brute force)** — the correctness oracle; its pair join
  explodes on shared shingles and is only for modest corpora / sampled
  validation of the LSH path.
* **SimHash** — 64 bit-position counters as 64 columns of one groupBy
  (map-side combined); near-dup = small Hamming distance on a 64-bit int,
  candidate generation by banding the signature bytes.

MinHash hash functions are ``md5(f"{i}:{shingle}")`` (seeded by index) —
deterministic, portable, and identical across engines, which the test
oracle exploits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SHINGLE = 3
DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4


def shingles(tokens_col: Column, n: int = DEFAULT_SHINGLE) -> Column:
    """Token n-gram shingles (distinct). Documents with fewer than ``n``
    tokens contribute one shingle — the whole token string — so short docs
    still participate."""
    whole = F.array(F.concat_ws(" ", tokens_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tokens_col) - n),
        lambda i: F.concat_ws(" ", F.slice(tokens_col, i + 1, n)))
    return F.array_distinct(
        F.when(F.size(tokens_col) >= n, grams).otherwise(whole))


def _tokens(text_col: str) -> Column:
    return F.split(F.lower(F.col(text_col)), " ")


# ---------------------------------------------------------------------------
# 1. Exact dedup
# ---------------------------------------------------------------------------

def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, cnt, keeper) per distinct text — keeper is the lowest
    id (deterministic survivor)."""
    return (df.select(F.md5(F.col(text_col)).alias("fingerprint"),
                      F.col(id_col))
              .groupBy("fingerprint")
              .agg(F.count("*").alias("cnt"),
                   F.min(id_col).alias("keeper")))


def drop_exact_duplicates(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Survivors only (keeper row per duplicate group). Broadcast is wrong
    here (keeper set ~ corpus size): this is a shuffle semi-join on the id,
    which AQE will plan as SMJ."""
    keepers = exact_duplicate_groups(df, text_col, id_col) \
        .select(F.col("keeper").alias(id_col))
    return df.join(keepers, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# 2. Shingle explode + exact Jaccard (oracle path)
# ---------------------------------------------------------------------------

def doc_shingles(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n: int = DEFAULT_SHINGLE) -> DataFrame:
    """(id, shingle) exploded distinct shingles."""
    return df.select(F.col(id_col),
                     F.explode(shingles(_tokens(text_col), n)).alias("shingle"))


def ngram_jaccard_pairs(df: DataFrame, threshold: float,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = DEFAULT_SHINGLE) -> DataFrame:
    """All pairs (a < b) with shingle-set Jaccard >= threshold.

    Brute force over pairs that share at least one shingle (any pair with
    Jaccard > 0 shares one, so nothing above the threshold is missed).
    Output: (id_a, id_b, jaccard) with jaccard as a raw double.
    """
    sh = doc_shingles(df, text_col, id_col, n).cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (a.join(b, on="shingle")
              .where(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b")
              .agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = (F.col("inter").cast("double")
           / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
                 .withColumn("jaccard", jac)
                 .where(F.col("jaccard") >= threshold)
                 .select("id_a", "id_b", "jaccard"))


# ---------------------------------------------------------------------------
# 3. MinHash + LSH (scale path)
# ---------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = DEFAULT_SHINGLE,
                       num_hashes: int = DEFAULT_NUM_HASHES) -> DataFrame:
    """One row per doc with columns h0..h{H-1}; h_i = min over shingles of
    md5(f"{i}:{shingle}") — H min-aggregates in ONE groupBy, so the shuffle
    carries only H strings per doc after map-side combine."""
    sh = doc_shingles(df, text_col, id_col, n)
    aggs = [F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))))
             .alias(f"h{i}") for i in range(num_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(sig_df: DataFrame, id_col: str = "doc_id",
                        num_hashes: int = DEFAULT_NUM_HASHES,
                        bands: int = DEFAULT_BANDS) -> DataFrame:
    """Distinct (id_a < id_b) pairs agreeing on at least one band.

    Bands are emitted as (band_id, band_sig) rows and joined on the
    signature — the LSH bucket join. Bucket sizes are small by design;
    a pathological bucket (mass-duplicated boilerplate) is exactly the
    AQE skew-join case, so leave AQE on.
    """
    rows_per_band = num_hashes // bands
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}")
                for r in range(rows_per_band)]
        band_structs.append(F.struct(F.lit(b).alias("band"),
                                     F.concat_ws("|", *cols).alias("sig")))
    banded = (sig_df.select(F.col(id_col),
                            F.explode(F.array(*band_structs)).alias("bs"))
                    .select(id_col, "bs.band", "bs.sig"))
    a = banded.select(F.col(id_col).alias("id_a"), "band", "sig")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "sig")
    return (a.join(b, on=["band", "sig"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())


def minhash_near_duplicates(df: DataFrame, threshold: float,
                            text_col: str = "text", id_col: str = "doc_id",
                            n: int = DEFAULT_SHINGLE,
                            num_hashes: int = DEFAULT_NUM_HASHES,
                            bands: int = DEFAULT_BANDS) -> DataFrame:
    """LSH candidates verified with exact shingle Jaccard >= threshold.
    Output: (id_a, id_b, raw-double jaccard)."""
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    sh = doc_shingles(df, text_col, id_col, n).cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (cands.join(a, "id_a").join(b, on=["id_b", "shingle"])
                  .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = (F.col("inter").cast("double")
           / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
                 .withColumn("jaccard", jac)
                 .where(F.col("jaccard") >= threshold)
                 .select("id_a", "id_b", "jaccard"))


# ---------------------------------------------------------------------------
# 4. SimHash
# ---------------------------------------------------------------------------

def _hash32(col: Column, hex_range: tuple[int, int]) -> Column:
    """32-bit int from md5 hex chars [start, start+8)."""
    start, length = hex_range
    return F.conv(F.substring(F.md5(col), start, length), 16, 10).cast("long")


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       n: int = DEFAULT_SHINGLE) -> DataFrame:
    """64-bit SimHash per doc as two 32-bit halves (hi, lo).

    Classic Charikar scheme: each shingle votes ±1 on every bit position of
    its 64-bit hash (md5 prefix); the signature sets bit i iff the vote sum
    is positive. Implemented as 64 ``sum`` aggregates in a single groupBy —
    map-side combined, one shuffle of 64 longs per doc.
    """
    sh = doc_shingles(df, text_col, id_col, n)
    hi = _hash32(F.col("shingle"), (1, 8))
    lo = _hash32(F.col("shingle"), (9, 8))
    aggs = []
    for i in range(32):
        bit_hi = F.shiftright(hi, i).bitwiseAND(F.lit(1))
        bit_lo = F.shiftright(lo, i).bitwiseAND(F.lit(1))
        aggs.append(F.sum(bit_hi * 2 - 1).alias(f"vh{i}"))
        aggs.append(F.sum(bit_lo * 2 - 1).alias(f"vl{i}"))
    votes = sh.groupBy(id_col).agg(*aggs)
    sim_hi = sum((F.when(F.col(f"vh{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
                  for i in range(32)), F.lit(0))
    sim_lo = sum((F.when(F.col(f"vl{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
                  for i in range(32)), F.lit(0))
    return votes.select(F.col(id_col),
                        sim_hi.cast("long").alias("simhash_hi"),
                        sim_lo.cast("long").alias("simhash_lo"))


def simhash_near_duplicates(df: DataFrame, max_hamming: int = 3,
                            text_col: str = "text", id_col: str = "doc_id",
                            n: int = DEFAULT_SHINGLE) -> DataFrame:
    """Pairs (a < b) with Hamming distance <= max_hamming over the 64-bit
    SimHash. Candidate generation bands the signature into 4 × 16-bit
    chunks (a pair within distance 3 must agree on >= 1 chunk); only
    banded collisions are compared, keeping the join linear."""
    sigs = simhash_signatures(df, text_col, id_col, n).cache()
    chunks = []
    for c in range(2):
        chunks.append(F.struct(F.lit(c).alias("chunk"),
                               (F.shiftright(F.col("simhash_hi"), c * 16)
                                .bitwiseAND(F.lit(0xFFFF))).alias("val")))
    for c in range(2):
        chunks.append(F.struct(F.lit(c + 2).alias("chunk"),
                               (F.shiftright(F.col("simhash_lo"), c * 16)
                                .bitwiseAND(F.lit(0xFFFF))).alias("val")))
    banded = (sigs.select(id_col, F.explode(F.array(*chunks)).alias("b"))
                  .select(id_col, "b.chunk", "b.val"))
    a = banded.select(F.col(id_col).alias("id_a"), "chunk", "val")
    b = banded.select(F.col(id_col).alias("id_b"), "chunk", "val")
    cands = (a.join(b, on=["chunk", "val"])
              .where(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b").distinct())
    sa = sigs.select(F.col(id_col).alias("id_a"),
                     F.col("simhash_hi").alias("hi_a"),
                     F.col("simhash_lo").alias("lo_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"),
                     F.col("simhash_hi").alias("hi_b"),
                     F.col("simhash_lo").alias("lo_b"))
    ham = (F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
           + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))))
    return (cands.join(sa, "id_a").join(sb, "id_b")
                 .withColumn("hamming", ham)
                 .where(F.col("hamming") <= max_hamming)
                 .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------------
# 5. Connected components over near-duplicate pairs (cluster dedup)
# ---------------------------------------------------------------------------

def connected_components(pairs: DataFrame, left: str = "id_a",
                         right: str = "id_b",
                         max_iterations: int = 50) -> DataFrame:
    """Connected components of the near-duplicate pair graph:
    (node, root) with root = the component's minimum node id.

    Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
    Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
    MapReduce and Beyond", SoCC'14), the standard shuffle-bounded CC for
    data too big for one machine: each round is two groupBy-min passes,
    edges converge to (node → component-min) stars in O(log n) rounds
    in practice. No driver-side graph state — the driver sees only a
    per-round convergence checksum (2 longs).

    100 TB shape: near-dup components are overwhelmingly tiny (pairs,
    triangles), so the star transforms shrink the edge set geometrically
    and every round is a plain aggregate — no vertex-indexed state,
    no message-passing framework.
    """
    edges = (pairs.select(F.col(left).cast("long").alias("u"),
                          F.col(right).cast("long").alias("v"))
             .where(F.col("u") != F.col("v")).distinct())
    prev_sig = None
    for _ in range(max_iterations):
        # large-star: for every node, link its LARGER neighbors to the
        # minimum of its neighborhood (incl. itself)
        nbrs = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (nbrs.groupBy("u")
             .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        edges = (nbrs.join(m, "u")
                 .where(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .where(F.col("u") != F.col("v")).distinct())
        # small-star: orient edges large→small, link every smaller
        # neighbor (and the center) to the neighborhood minimum
        oriented = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        m = (oriented.groupBy("u")
             .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        stars = oriented.join(m, "u")
        edges = (stars.select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .unionByName(stars.select("u", F.col("m").alias("v")))
                 .where(F.col("u") != F.col("v")).distinct())
        edges = edges.localCheckpoint()   # cut the iterative lineage
        sig = edges.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h")).collect()[0]
        cur = (int(sig["n"]), int(sig["h"] or 0))
        if cur == prev_sig:
            break
        prev_sig = cur
    # converged edges are (node → root) stars; the roots themselves have
    # no outgoing edge, so they re-enter as (root, root) self-rows —
    # every node of the pair graph gets exactly one row
    stars = edges.select(F.col("u").alias("node"), F.col("v").alias("root"))
    nodes = (pairs.select(F.col(left).cast("long").alias("node"))
             .unionByName(pairs.select(F.col(right).cast("long")
                                       .alias("node"))).distinct())
    return (nodes.join(stars, "node", "left")
            .withColumn("root", F.coalesce("root", "node")))


def drop_near_duplicates(df: DataFrame, threshold: float = 0.8,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Cluster-level near-dup removal: MinHash-LSH pairs → connected
    components → keep each component's minimum-id doc (the deterministic
    representative). Transitive: a~b, b~c drops both b and c even when
    a~c is below threshold — the dedup semantics training pipelines
    want (one survivor per duplicate CLUSTER, not per pair)."""
    pairs = minhash_near_duplicates(df, threshold, text_col, id_col)
    cc = connected_components(pairs)
    return (df.join(cc.withColumnRenamed("node", id_col), id_col, "left")
            .where(F.col("root").isNull()
                   | (F.col("root") == F.col(id_col)))
            .drop("root"))
