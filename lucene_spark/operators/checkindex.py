"""CheckIndex: offline index integrity verification.

Reference: ``index/CheckIndex.java:90,529`` — walks every segment,
decodes every posting list, and cross-checks the structures (postings
sorted, counts consistent, norms present for every doc). Usable as a
library call and from the CLI (``python -m lucene_spark.cli check``),
like the reference's command-line tool.

The per-segment check is self-contained by design: ``check_index``
walks segments on the driver by default (small indexes, CLI use), and
with ``spark=`` fans the SAME check out as one task per segment — the
shape that holds at 10^12 docs, where no single machine can sweep the
index (segment files live on shared storage, so any executor can read
its assigned segment).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..functions import codec
from ..functions.smallfloat import int_to_byte4
from ..sources.catalog import SnapshotCatalog


class CheckIndexError(AssertionError):
    pass


def _check(cond, seg_id, msg):
    if not cond:
        raise CheckIndexError(f"segment {seg_id}: {msg}")


def check_segment(seg_dir: str, seg_id: int,
                  store_positions: bool = True) -> dict:
    """Verify one segment; returns its counts."""
    postings = pd.read_parquet(os.path.join(seg_dir, "postings.parquet"))
    meta = pd.read_parquet(os.path.join(seg_dir, "doc_meta.parquet"))
    norms = pd.read_parquet(os.path.join(seg_dir, "norms.parquet"))
    n = int(norms.iloc[0]["num_docs"])

    local = np.sort(meta["local_doc_id"].to_numpy())
    _check(np.array_equal(local, np.arange(n)), seg_id,
           "doc_meta local ids not dense 0..n-1")
    _check(np.array_equal(
        meta.sort_values("local_doc_id")["norm_byte"].to_numpy(),
        int_to_byte4(meta.sort_values("local_doc_id")["doc_len"]
                     .to_numpy()).astype(np.int32)),
        seg_id, "norm_byte != SmallFloat(doc_len)")
    nb = np.frombuffer(norms.iloc[0]["norm_bytes"], dtype=np.uint8)
    _check(len(nb) == n, seg_id, "norms length != num_docs")
    gids = np.frombuffer(norms.iloc[0]["global_doc_ids"], dtype="<i8")
    _check(len(gids) == n, seg_id, "global_doc_ids length != num_docs")
    # gids are sorted in fresh segments but merge concatenates docBase
    # ranges of mod-partitioned inputs — only uniqueness is invariant
    _check(len(np.unique(gids)) == len(gids), seg_id,
           "duplicate global doc ids")

    terms = postings["term"].to_numpy()
    _check(bool(np.all(terms[:-1] <= terms[1:])) or len(terms) <= 1,
           seg_id, "terms not sorted")
    num_postings = 0
    sum_ttf = 0
    for _, row in postings.iterrows():
        dec = codec.decode_postings(row, with_positions=store_positions)
        ids, tfs = dec["doc_ids"], dec["tfs"]
        t = row["term"]
        _check(len(ids) == row["df"], seg_id, f"{t}: df != len(doc_ids)")
        _check(len(ids) == 0 or np.all(np.diff(ids) > 0), seg_id,
               f"{t}: doc ids not strictly increasing")
        _check(int(tfs.sum()) == row["ttf"], seg_id, f"{t}: sum(tf) != ttf")
        _check(np.all(tfs >= 1), seg_id, f"{t}: tf < 1")
        _check(np.all((ids >= 0) & (ids < n)), seg_id,
               f"{t}: doc id out of range")
        bl = codec.decode_block_ranges(row["block_last"])
        _check(len(bl) == (len(ids) + codec.BLOCK_SIZE - 1)
               // codec.BLOCK_SIZE, seg_id, f"{t}: block count mismatch")
        _check(bl[-1] == ids[-1], seg_id, f"{t}: last block bound wrong")
        if store_positions and row["pos_bytes"]:
            _check(np.all(dec["positions"] >= 0), seg_id,
                   f"{t}: negative position")
        if "pay_bytes" in postings.columns:
            _check(len(row["pay_bytes"]) == 4 * int(row["ttf"]), seg_id,
                   f"{t}: payload stream length != 4 * ttf")
        imps = codec.decode_impacts(row["impact_bytes"], len(bl))
        for pairs in imps:
            for i in range(len(pairs)):       # Pareto frontier dominance
                for j in range(len(pairs)):
                    _check(i == j or not (pairs[i][0] >= pairs[j][0]
                                          and pairs[i][1] <= pairs[j][1]),
                           seg_id, f"{t}: dominated impact pair")
        num_postings += len(ids)
        sum_ttf += int(tfs.sum())
    return {"num_docs": n, "num_terms": len(postings),
            "num_postings": num_postings, "sum_ttf": sum_ttf,
            "sum_doc_len": int(meta["doc_len"].sum())}


def check_index(index_dir: str, snapshot_id: int | None = None,
                spark=None) -> dict:
    """Verify every segment of a snapshot + the snapshot-level stats.
    Returns totals; raises :class:`CheckIndexError` on any violation.
    With ``spark``, segments are verified in parallel — one executor
    task per segment, only (counts | error) rows return to the driver."""
    from .delete import load_deletes
    catalog = SnapshotCatalog(index_dir)
    snap = catalog.load(snapshot_id)
    if snap is None:
        raise CheckIndexError(f"no snapshot in {index_dir}")
    store_positions = bool(snap.extra.get("store_positions", True))
    totals = {"segments": 0, "num_docs": 0, "num_terms": 0,
              "num_postings": 0, "sum_doc_len": 0, "sum_ttf": 0}
    lineage = {s["seg_id"]: s for s in snap.segments}

    if spark is not None and snap.seg_ids:
        segs = [(int(s), catalog.segment_dir(s)) for s in snap.seg_ids]
        sdf = spark.createDataFrame(segs, "seg_id int, dir string")

        def run(batches):
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    try:
                        res = check_segment(r.dir, int(r.seg_id),
                                            store_positions)
                        res = {**res, "seg_id": int(r.seg_id), "error": ""}
                    except CheckIndexError as e:
                        res = {"num_docs": 0, "num_terms": 0,
                               "num_postings": 0, "sum_ttf": 0,
                               "sum_doc_len": 0, "seg_id": int(r.seg_id),
                               "error": str(e)}
                    yield pd.DataFrame([res])

        rows = (sdf.repartition(len(segs))
                .mapInPandas(run, "num_docs long, num_terms long, "
                                  "num_postings long, sum_ttf long, "
                                  "sum_doc_len long, seg_id int, "
                                  "error string")
                .collect())
        per_seg = {int(r["seg_id"]): r for r in rows}
        for s in snap.seg_ids:
            r = per_seg[int(s)]
            if r["error"]:
                raise CheckIndexError(r["error"])
            results = {k: int(r[k]) for k in
                       ("num_docs", "num_terms", "num_postings",
                        "sum_doc_len")}
            _check(results["num_docs"] == lineage[s]["num_docs"], s,
                   "lineage num_docs mismatch")
            _check(results["sum_doc_len"] == lineage[s]["sum_doc_len"], s,
                   "lineage sum_doc_len mismatch")
            _check(int(r["sum_ttf"])
                   == lineage[s].get("sum_token_len",
                                     lineage[s]["sum_doc_len"]), s,
                   "lineage sum_token_len != postings token count")
            totals["segments"] += 1
            totals["sum_ttf"] += int(r["sum_ttf"])
            for k in ("num_docs", "num_terms", "num_postings",
                      "sum_doc_len"):
                totals[k] += results[k]
    else:
        for s in snap.seg_ids:
            res = check_segment(catalog.segment_dir(s), s, store_positions)
            _check(res["num_docs"] == lineage[s]["num_docs"], s,
                   "lineage num_docs mismatch")
            _check(res["sum_doc_len"] == lineage[s]["sum_doc_len"], s,
                   "lineage sum_doc_len mismatch")
            _check(res["sum_ttf"]
                   == lineage[s].get("sum_token_len",
                                     lineage[s]["sum_doc_len"]), s,
                   "lineage sum_token_len != postings token count")
            totals["segments"] += 1
            totals["sum_ttf"] += res["sum_ttf"]
            for k in ("num_docs", "num_terms", "num_postings",
                      "sum_doc_len"):
                totals[k] += res[k]
    _check(totals["num_docs"] == int(snap.field_stats["doc_count"]), -1,
           "field_stats doc_count != sum of segments")
    _check(totals["sum_ttf"]
           == int(snap.field_stats["sum_total_term_freq"]), -1,
           "field_stats sum_total_term_freq != total indexed tokens")
    deletes = load_deletes(catalog, snap)
    for s, ids in deletes.items():
        _check(s in lineage, s, "tombstones for unknown segment")
        _check(np.all((ids >= 0) & (ids < lineage[s]["num_docs"])), s,
               "tombstone local id out of range")
    # raw tombstone TABLE invariants (load_deletes dedupes, so dupes and
    # count drift are only visible on the store itself): no duplicate
    # (seg, doc) rows, and the snapshot's num_deleted matches the table
    rel = (snap.extra or {}).get("deletes")
    if rel:
        path = rel if os.path.isabs(rel) else os.path.join(index_dir, rel)
        raw = pd.read_parquet(path)
        _check(int(raw.duplicated(["seg_id", "local_doc_id"]).sum()) == 0,
               -1, "duplicate tombstone rows")
        _check(int(snap.extra.get("num_deleted", -1)) == len(raw), -1,
               "extra.num_deleted != tombstone table rows")
    totals["num_deleted"] = int(sum(len(v) for v in deletes.values()))
    totals["snapshot_id"] = snap.snapshot_id
    return totals
