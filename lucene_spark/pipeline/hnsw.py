"""Per-shard HNSW graphs for approximate nearest-neighbor search.

Reference: Lucene builds one HNSW graph PER SEGMENT
(``util/hnsw/HnswGraphBuilder.java:58``, ``HnswGraphSearcher.java:33``,
written by ``codecs/lucene99/Lucene99HnswVectorsWriter``) and
``KnnFloatVectorQuery`` searches every leaf's graph independently, then
merges per-leaf top-k by score (``search/AbstractKnnVectorQuery.java``).
That execution model maps 1:1 onto Spark:

* **Build**: the corpus is deterministically sharded (``vec_id %
  num_shards`` — the segment role); ONE ``applyInPandas`` task per shard
  builds that shard's graph with the classic HNSW algorithm
  (hash-deterministic level assignment, diversity-heuristic neighbor
  selection — the same heuristic Lucene's ``diversityUpdate`` applies).
  The graph is emitted as plain rows ``(shard, vec_id, level,
  neighbors[level][...])`` — a parquet-friendly adjacency table, no
  driver materialization of any shard.
* **Search**: per-shard beam searches run in parallel (again one task
  per shard, queries shipped in the task closure like the broadcast
  query side of ``brute_force_topk``); each shard returns ≤k candidate
  ids per query. Candidates are then RESCORED JVM-side with the exact
  same ``cosine()`` Catalyst expression the brute-force baseline uses
  and merged with one global window top-k — so final scores are
  bit-identical to the exact path, and the graph influences only
  *which* candidates surface (Lucene's two-phase approximate-gather /
  exact-merge shape).

Scale: each shard's graph build is O(n_shard · ef · M) local work with
no shuffle beyond the one shard partitioning; shard count scales with
executors, graphs never co-reside. Search touches ~ef·M nodes per
(query, shard) regardless of corpus size. Recall is differential-tested
against brute force; with ``ef`` ≥ shard size the beam degenerates to an
exhaustive connected-component walk (the exactness hook the driver
entry uses at test scale).
"""

from __future__ import annotations

import hashlib
import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

GRAPH_SCHEMA = ("shard int, vec_id long, level int, "
                "neighbors array<array<long>>, vector array<float>")


def _levels(ids: np.ndarray, M: int) -> np.ndarray:
    """Deterministic HNSW level per node: the paper's floor(-ln(U)·mL)
    with U drawn from md5(vec_id) instead of a RNG, so rebuilds (and the
    DuckDB twin of any fixture) see the identical graph."""
    m_l = 1.0 / math.log(M)
    out = np.empty(len(ids), dtype=np.int64)
    for i, v in enumerate(ids):
        h = int.from_bytes(hashlib.md5(str(int(v)).encode()).digest()[:8],
                           "big")
        u = (h + 1.0) / 2.0 ** 64
        out[i] = int(-math.log(u) * m_l)
    return out


class _ShardGraph:
    """In-memory HNSW graph of one shard (numpy vectors + per-level
    adjacency of local ordinals). Insertion order and every tie-break is
    by ordinal, so the structure is a pure function of (ids, vectors)."""

    def __init__(self, vecs: np.ndarray, ids: np.ndarray, M: int = 16,
                 ef_construction: int = 100):
        order = np.argsort(ids, kind="stable")
        self.ids = ids[order].astype(np.int64)
        v = vecs[order].astype(np.float64)
        n = np.linalg.norm(v, axis=1)
        n[n == 0] = 1.0
        self.unit = v / n[:, None]
        self.M = M
        self.ef_c = ef_construction
        self.levels = _levels(self.ids, M)
        self.adj: list[list[list[int]]] = [
            [[] for _ in range(int(lv) + 1)] for lv in self.levels]
        self.entry = -1
        self.top = -1
        for i in range(len(self.ids)):
            self._insert(i)
        # normalize the entry point to the lowest ordinal at the top
        # level so a graph rebuilt from its stored rows (which keep no
        # entry pointer) searches identically to the freshly built one
        if self.entry >= 0:
            self.entry = int(np.nonzero(self.levels == self.top)[0][0])

    # -- primitives --------------------------------------------------------
    def _sim(self, q: np.ndarray, nodes) -> np.ndarray:
        return self.unit[np.asarray(nodes, dtype=np.int64)] @ q

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int,
                      layer: int) -> list[tuple[float, int]]:
        """Best-first beam (paper alg. 2); returns up to ef (sim, node)
        sorted by sim desc, node asc."""
        sims = self._sim(q, eps)
        visited = set(eps)
        cand = [(-s, e) for s, e in zip(sims, eps)]   # max-heap on sim
        heapq.heapify(cand)
        best = [(s, -e) for s, e in zip(sims, eps)]   # min-heap keeps top ef
        heapq.heapify(best)
        while len(best) > ef:
            heapq.heappop(best)
        while cand:
            negs, c = heapq.heappop(cand)
            if best and -negs < best[0][0] and len(best) >= ef:
                break
            nbrs = [x for x in self.adj[c][layer] if x not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            for s, x in zip(self._sim(q, nbrs), nbrs):
                if len(best) < ef or s > best[0][0] \
                        or (s == best[0][0] and -x > best[0][1]):
                    heapq.heappush(best, (s, -x))
                    heapq.heappush(cand, (-s, x))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted(((s, -ni) for s, ni in best),
                      key=lambda t: (-t[0], t[1]))

    def _select(self, q: np.ndarray, cand: list[tuple[float, int]],
                M: int) -> list[int]:
        """Diversity heuristic (paper alg. 4, Lucene's diversity check):
        scan by sim desc; keep c only if no already-selected s is closer
        to c than c is to q."""
        sel: list[int] = []
        for s, c in cand:
            if len(sel) == M:
                break
            if not sel or np.all(self._sim(self.unit[c], sel) <= s):
                sel.append(c)
        return sel

    def _max_conn(self, layer: int) -> int:
        return self.M * 2 if layer == 0 else self.M

    def _insert(self, i: int) -> None:
        if self.entry < 0:
            self.entry, self.top = i, int(self.levels[i])
            return
        q = self.unit[i]
        lvl = int(self.levels[i])
        eps = [self.entry]
        for layer in range(self.top, lvl, -1):
            eps = [self._search_layer(q, eps, 1, layer)[0][1]]
        for layer in range(min(lvl, self.top), -1, -1):
            cand = self._search_layer(q, eps, self.ef_c, layer)
            sel = self._select(q, cand, self.M)
            self.adj[i][layer] = list(sel)
            for j in sel:
                lst = self.adj[j][layer]
                lst.append(i)
                if len(lst) > self._max_conn(layer):
                    ranked = sorted(
                        zip(self._sim(self.unit[j], lst), lst),
                        key=lambda t: (-t[0], t[1]))
                    self.adj[j][layer] = self._select(
                        self.unit[j], ranked, self._max_conn(layer))
            eps = [c for _, c in cand]
        if lvl > self.top:
            self.entry, self.top = i, lvl

    def search(self, q: np.ndarray, k: int, ef: int) -> list[int]:
        """Top-k local ordinals by cosine (HnswGraphSearcher.search)."""
        if self.entry < 0:
            return []
        nq = np.linalg.norm(q)
        qu = q / (nq if nq else 1.0)
        eps = [self.entry]
        for layer in range(self.top, 0, -1):
            eps = [self._search_layer(qu, eps, 1, layer)[0][1]]
        hits = self._search_layer(qu, eps, max(ef, k), 0)
        return [c for _, c in hits[:k]]


def build_hnsw(corpus: DataFrame, num_shards: int = 4, M: int = 16,
               ef_construction: int = 100, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Build per-shard HNSW graphs; returns the adjacency table
    (GRAPH_SCHEMA rows, one per node). Deterministic: shard = id %
    num_shards, insertion by id order, hash-derived levels."""

    def build_shard(key, pdf: pd.DataFrame):
        ids = pdf["_id"].to_numpy(np.int64)
        vecs = np.stack(pdf["_vec"].to_numpy())
        g = _ShardGraph(vecs, ids, M=M, ef_construction=ef_construction)
        return pd.DataFrame({
            "shard": np.full(len(g.ids), key[0], dtype=np.int32),
            "vec_id": g.ids,
            "level": g.levels.astype(np.int32),
            "neighbors": [[[int(g.ids[x]) for x in lvl] for lvl in a]
                          for a in g.adj],
            "vector": [np.asarray(v, dtype=np.float32) for v in
                       np.stack(pdf.sort_values("_id")["_vec"]
                                .to_numpy())],
        })

    src = corpus.select(
        (F.col(id_col) % num_shards).cast("int").alias("shard"),
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).alias("_vec"))
    return src.groupBy("shard").applyInPandas(build_shard, GRAPH_SCHEMA)


def _rebuild(pdf: pd.DataFrame, M: int) -> tuple[_ShardGraph, np.ndarray]:
    """Reconstruct a _ShardGraph from its adjacency rows (no re-insert —
    the stored edges ARE the graph)."""
    pdf = pdf.sort_values("vec_id", kind="mergesort")
    ids = pdf["vec_id"].to_numpy(np.int64)
    g = _ShardGraph.__new__(_ShardGraph)
    g.ids = ids
    v = np.stack(pdf["vector"].to_numpy()).astype(np.float64)
    n = np.linalg.norm(v, axis=1)
    n[n == 0] = 1.0
    g.unit = v / n[:, None]
    g.M = M
    pos = {int(x): i for i, x in enumerate(ids)}
    g.levels = pdf["level"].to_numpy(np.int64)
    g.adj = [[[pos[int(x)] for x in lvl] for lvl in nb]
             for nb in pdf["neighbors"]]
    top = int(g.levels.max()) if len(ids) else -1
    g.top = top
    cands = np.nonzero(g.levels == top)[0]
    g.entry = int(cands[0]) if len(cands) else -1
    return g, ids


def hnsw_topk(graph: DataFrame, queries: DataFrame, k: int = 5,
              ef: int = 64, M: int = 16, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: per-shard graph beam search → candidate ids →
    JVM-side exact-cosine rescore → one global top-k per query
    (AbstractKnnVectorQuery's per-leaf search + TopDocs merge).

    Output schema matches :func:`...simsearch.brute_force_topk`:
    (query_id, neighbor_id, rank, cos) — cos computed by the SAME
    Catalyst expression, so scores are bit-identical to the exact path.
    The query set is collected to the driver (the same small-side bound
    as the broadcast query side of brute_force_topk)."""
    from .simsearch import cosine

    qrows = (queries.select(F.col(id_col).cast("long").alias("qid"),
                            F.col(vec_col).alias("qv")).collect())
    qids = [int(r["qid"]) for r in qrows]
    qvecs = np.stack([np.asarray(r["qv"], dtype=np.float64)
                      for r in qrows])

    def search_shard(key, pdf: pd.DataFrame):
        g, ids = _rebuild(pdf, M)
        out_q, out_n = [], []
        for qi, qv in zip(qids, qvecs):
            # over-fetch by one so a self-match can't evict a true hit
            hits = [int(ids[o]) for o in g.search(qv, k + 1, ef)]
            for h in hits:
                if h != qi:
                    out_q.append(qi)
                    out_n.append(h)
        return pd.DataFrame({"query_id": np.asarray(out_q, np.int64),
                             "neighbor_id": np.asarray(out_n, np.int64)})

    cand = (graph.groupBy("shard")
            .applyInPandas(search_shard,
                           "query_id long, neighbor_id long"))
    nvec = graph.select(F.col("vec_id").alias("neighbor_id"),
                        F.col("vector").alias("cvec"))
    qvec = F.broadcast(queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("qvec")))
    scored = (cand.join(nvec, "neighbor_id").join(qvec, "query_id")
              .select("query_id", "neighbor_id",
                      cosine(F.col("qvec"), F.col("cvec")).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos"))
