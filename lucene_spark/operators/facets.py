"""Facets, grouping and query-time join over search results.

These are the reference's facet/grouping/join modules re-expressed as
DataFrame compositions on top of ``Searcher.score_all`` /
``matching_docs`` (reference: ``lucene/facet/.../FastTaxonomyFacetCounts
.java``, ``facet/range/LongRangeCounter.java``, ``facet/DrillSideways
.java``, ``grouping/FirstPassGroupingCollector.java``,
``join/JoinUtil.java``). The match set is computed ONCE per query by the
per-segment kernel; everything downstream is Catalyst-planned joins and
aggregations — facet counting over a 100 TB corpus is a semi-join plus a
groupBy with map-side partial aggregation, never a postings re-scan per
dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def facet_counts(searcher, query, dims_df: DataFrame, dim_col: str,
                 doc_id_col: str = "doc_id") -> DataFrame:
    """Per-value doc counts of ``dim_col`` over the query's match set
    (SortedSetDocValuesFacetCounts role). One shuffle for the semi-join,
    one partial-aggregated groupBy."""
    matched = searcher.matching_docs(query)
    return (matched.join(dims_df.select(doc_id_col, dim_col), doc_id_col)
            .groupBy(dim_col).agg(F.count("*").alias("cnt")))


def sampled_facet_counts(searcher, query, dims_df: DataFrame, dim_col: str,
                         fraction: float, doc_id_col: str = "doc_id",
                         amortize: bool = True) -> DataFrame:
    """RandomSamplingFacetsCollector role (reference
    ``facet/RandomSamplingFacetsCollector.java:37-104,214-230``): facet
    counts computed over a deterministic sample of the match set, then
    amortized back to full-set scale by dividing by the EXACT sampled
    fraction (the reference's amortizeFacetCounts divides by its
    samplingRate). Divergence note: the reference samples with a seeded
    XORShift64 bin walk over the hit order — an inherently sequential
    RNG; the Spark-native equivalent is a uniform content hash
    (``md5(doc_id)`` prefix below the fraction cut), which is
    deterministic, order-free and shards identically on any cluster.

    Returns ``(dim_col, sampled_cnt long, est_cnt double)``; ``est_cnt``
    is sampled_cnt / actual_fraction (actual = sampled/total matched,
    like the reference's totalHits-derived rate), omitted scaling when
    ``amortize=False``. Scale: adds one cheap hash filter before the
    same semi-join + map-side-combined groupBy as
    :func:`facet_counts`."""
    if not (0 < fraction <= 1):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    matched = searcher.matching_docs(query)
    # fraction >= 1.0 would format to the 9-char '100000000', which an
    # 8-char hex prefix only lexicographically undercuts when it starts
    # with '0' (~1/16 of docs). 'g' sorts above every hex digit, so it
    # keeps all docs — same sentinel as pipeline/mix.py.
    cut = "g" if fraction >= 1.0 else format(int(fraction * 16**8), "08x")
    sample = matched.filter(
        F.substring(F.md5(F.col(doc_id_col).cast("string")), 1, 8) < cut)
    counts = (sample.join(dims_df.select(doc_id_col, dim_col), doc_id_col)
              .groupBy(dim_col)
              .agg(F.count("*").alias("sampled_cnt")))
    if not amortize:
        return counts
    total = matched.count()
    n_sampled = sample.count()
    rate = (n_sampled / total) if total else 1.0
    return counts.withColumn(
        "est_cnt", F.col("sampled_cnt").cast("double")
        / F.lit(float(rate) if rate else 1.0))


def range_facet_counts(searcher, query, dims_df: DataFrame, num_col: str,
                       buckets: list[tuple[int, int]],
                       doc_id_col: str = "doc_id") -> DataFrame:
    """LongRangeFacetCounts: doc counts per [lo, hi) numeric range over the
    match set. Ranges may overlap (a doc counts in every range containing
    it), matching the reference's semantics — hence one CASE column per
    range summed in a single pass, not a bucketed groupBy."""
    matched = searcher.matching_docs(query)
    joined = matched.join(dims_df.select(doc_id_col, num_col), doc_id_col)
    aggs = [F.sum(F.when((F.col(num_col) >= lo) & (F.col(num_col) < hi), 1)
                  .otherwise(0)).alias(f"r{i}")
            for i, (lo, hi) in enumerate(buckets)]
    row = joined.agg(*aggs)
    names = [f"range_{lo}_{hi}" for lo, hi in buckets]
    pairs = ", ".join(f"'{n}', cast(r{i} as bigint)"
                      for i, n in enumerate(names))
    return (row.select(F.explode(F.expr(f"map({pairs})"))
                       .alias("bucket", "cnt")))


def drill_sideways(searcher, base_query, drill_query, dims_df: DataFrame,
                   dim_col: str, doc_id_col: str = "doc_id") -> DataFrame:
    """DrillSideways: facet counts of ``dim_col`` over docs matching the
    base query alone (sideways counts) alongside counts after applying the
    drill-down — both from one match-set computation each, combined with a
    full outer join on the facet value."""
    side = facet_counts(searcher, base_query, dims_df, dim_col, doc_id_col) \
        .withColumnRenamed("cnt", "sideways_cnt")
    from ..plans import query as Q
    drilled = facet_counts(searcher, Q.And((base_query, drill_query)),
                           dims_df, dim_col, doc_id_col) \
        .withColumnRenamed("cnt", "drill_cnt")
    return (side.join(drilled, dim_col, "full_outer")
            .select(dim_col,
                    F.coalesce("sideways_cnt", F.lit(0)).alias("sideways_cnt"),
                    F.coalesce("drill_cnt", F.lit(0)).alias("drill_cnt")))


def facet_path_counts(searcher, query, dims_df: DataFrame, path_col: str,
                      doc_id_col: str = "doc_id",
                      sep: str = "/") -> DataFrame:
    """Hierarchical taxonomy facet counts (reference ``facet/taxonomy/
    TaxonomyReader.java:59`` + ``FastTaxonomyFacetCounts``): ``path_col``
    holds ``a/b/c`` dimension paths; every PREFIX level gets a doc count
    (the taxonomy's rollup — counting a doc at ``a/b/c`` increments
    ``a``, ``a/b`` and ``a/b/c``), computed over the query's match set.

    Spark shape: one semi-join for the match set, one prefix explode
    (``depth`` rows per doc — taxonomy depths are small constants), one
    map-side-combined groupBy. No taxonomy sidecar index is needed: the
    prefix explode IS the ordinal hierarchy, and Catalyst folds it into
    the scan projection."""
    matched = searcher.matching_docs(query)
    joined = matched.join(dims_df.select(doc_id_col, path_col), doc_id_col)
    parts = F.split(F.col(path_col), sep)
    prefixes = (joined
                .select(F.explode(F.sequence(F.lit(1), F.size(parts)))
                        .alias("d"), F.col(path_col))
                .select(F.array_join(
                    F.slice(F.split(F.col(path_col), sep), 1, F.col("d")),
                    sep).alias("path")))
    return prefixes.groupBy("path").agg(F.count("*").alias("cnt"))


def drill_down_path(searcher, query, dims_df: DataFrame, path_col: str,
                    prefix: str, doc_id_col: str = "doc_id",
                    sep: str = "/") -> DataFrame:
    """FacetsConfig-style drill-down: restrict the match set to docs
    whose dimension path is under ``prefix`` and count the CHILD labels
    one level below it (DrillDownQuery + taxonomy child traversal).
    Output: (child string, cnt)."""
    depth = len(prefix.split(sep))
    matched = searcher.matching_docs(query)
    joined = matched.join(dims_df.select(doc_id_col, path_col), doc_id_col)
    parts = F.split(F.col(path_col), sep)
    under = joined.where(
        F.array_join(F.slice(parts, 1, depth), sep) == prefix)
    return (under.where(F.size(parts) > depth)
            .select(F.split(F.col(path_col), sep)
                    .getItem(depth).alias("child"))
            .groupBy("child").agg(F.count("*").alias("cnt")))


def all_groups_count(searcher, query, dims_df: DataFrame,
                     group_col: str,
                     doc_id_col: str = "doc_id") -> int:
    """AllGroupsCollector role (reference ``grouping/
    AllGroupsCollector.java``): the number of DISTINCT group values over
    the query's match set — one semi-join + countDistinct, map-side
    partial aggregation."""
    matched = searcher.matching_docs(query)
    row = (matched.join(dims_df.select(doc_id_col, group_col), doc_id_col)
           .agg(F.countDistinct(group_col).alias("n")).collect())
    return int(row[0]["n"])


def grouped_top_k(searcher, query, dims_df: DataFrame, group_col: str,
                  k_per_group: int = 2,
                  doc_id_col: str = "doc_id") -> DataFrame:
    """Two-pass grouping collector (top docs per group by score): a window
    rank per group over the scored match set — Spark's partial top-k via
    rank filter replaces the reference's two collector passes."""
    scored = searcher.score_all(query) \
        .join(dims_df.select(doc_id_col, group_col), doc_id_col)
    w = Window.partitionBy(group_col).orderBy(F.desc("score"),
                                              F.asc(doc_id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k_per_group)
            .select(group_col, doc_id_col,
                    F.col("rank").cast("int").alias("rank"), "score"))


def distinct_values(searcher, query, dims_df: DataFrame, group_col: str,
                    count_col: str,
                    doc_id_col: str = "doc_id") -> DataFrame:
    """DistinctValuesCollector role (reference ``grouping/
    DistinctValuesCollector.java``): for each group value in the query's
    match set, the DISTINCT values of ``count_col`` (one row per
    (group, value) pair — the relational form of the reference's
    per-group uniqueValues sets; NULL count values are kept, like the
    reference's explicit null entry in GroupCount.uniqueValues).

    Plan: one semi-join to the match set, then a single map-side
    partially-aggregated distinct on (group, value) — no per-group
    state anywhere."""
    matched = searcher.matching_docs(query)
    return (matched.join(
        dims_df.select(doc_id_col, group_col, count_col), doc_id_col)
        .select(group_col, count_col).distinct())


def diversified_top_k(searcher, query, keys_df: DataFrame, key_col: str,
                      k: int = 10, max_per_key: int = 1,
                      doc_id_col: str = "doc_id") -> DataFrame:
    """DiversifiedTopDocsCollector role (reference ``misc/search/
    DiversifiedTopDocsCollector.java:103-156``): global top-``k`` by
    score with at most ``max_per_key`` hits per key.

    The reference's one-pass dual-queue greedy (a doc enters only while
    locally competitive within its key queue AND globally competitive;
    global evictions pop the key queues) admits exactly the global
    top-k of the per-key-top-``max_per_key`` set, with the standard
    (score desc, doc asc) tie order — so the declarative plan is a
    per-key window rank filter followed by a global top-k. Spark
    executes that as one shuffle on the key (AQE-skew-safe) and a
    TakeOrderedAndProject with per-partition partial top-k — no
    per-key queues materialize anywhere.
    """
    scored = searcher.score_all(query) \
        .join(keys_df.select(doc_id_col, key_col), doc_id_col)
    w = Window.partitionBy(key_col).orderBy(F.desc("score"),
                                            F.asc(doc_id_col))
    kept = (scored.withColumn("_kr", F.row_number().over(w))
            .where(F.col("_kr") <= max_per_key))
    top = (kept.orderBy(F.desc("score"), F.asc(doc_id_col)).limit(k)
           .select(doc_id_col, key_col, "score"))
    wg = Window.orderBy(F.desc("score"), F.asc(doc_id_col))
    return (top.withColumn("rank", F.row_number().over(wg))
            .select(doc_id_col, F.col("rank").cast("int").alias("rank"),
                    key_col, "score"))


def to_parent_block_join(searcher, child_query, parents_df: DataFrame,
                         score_mode: str = "max",
                         doc_id_col: str = "doc_id",
                         bucket: int = 1024) -> DataFrame:
    """ToParentBlockJoinQuery (reference ``lucene/join/.../
    ToParentBlockJoinQuery.java``): match parents whose CHILD documents
    match ``child_query``; the parent's score aggregates its matching
    children's scores per ``score_mode`` (Max / Total / Avg / None —
    ``search/join/ScoreMode.java``).

    Block semantics match the reference's addDocuments contract: children
    occupy the doc-id range (previous parent, parent) — the parent is the
    LAST doc of its block — so ``parents_df`` (one ``doc_id`` column, the
    parent filter's match set) fully determines the block structure.

    Spark shape: block intervals are derived from the parent list alone —
    parents range-partition by id and each partition computes its lags
    locally; the cross-partition boundary (the previous partition's LAST
    parent) resolves through a per-partition max table (one row per
    partition on the driver — thousands of rows at any corpus scale),
    never a global single-partition window. Children then map to
    intervals through a bucketed range join (intervals explode into the
    ``bucket``-sized id buckets they cover — blocks are small, so ~1-2
    buckets each — then an equi-join on bucket + range filter). No
    broadcast of the parent set is required, so the plan survives
    billions of parents; the aggregation is one map-side combined
    groupBy(parent_id).

    Output: (parent_id, score float, n_children int), score = float32
    cast of the double aggregate like the reference's BlockJoinScorer.
    """
    agg = {"max": F.max(F.col("score").cast("double")),
           "total": F.sum(F.col("score").cast("double")),
           "avg": F.avg(F.col("score").cast("double")),
           "none": F.lit(1.0)}.get(score_mode)
    if agg is None:
        raise ValueError(f"unknown score_mode {score_mode!r}")
    child_scores = searcher.score_all(child_query)
    iv = _parent_intervals(parents_df, doc_id_col, bucket)
    ch = child_scores.withColumn("b",
                                 F.floor(F.col(doc_id_col) / bucket))
    joined = (ch.join(iv, on="b")
                .where((F.col(doc_id_col) >= F.col("start"))
                       & (F.col(doc_id_col) < F.col("parent_id"))))
    return (joined.groupBy("parent_id")
            .agg(agg.cast("float").alias("score"),
                 F.count("*").cast("int").alias("n_children")))


def _parent_intervals(parents_df: DataFrame, doc_id_col: str,
                      bucket: int) -> DataFrame:
    """Block intervals (parent_id, start, b) from the parent id list —
    the addDocuments block contract: children occupy (previous parent,
    parent). Bucketed by ``bucket``-sized id ranges for the range join;
    shared by the to-parent and to-child block joins."""
    ranged = (parents_df.select(F.col(doc_id_col).alias("parent_id"))
              .repartitionByRange(F.col("parent_id"))
              .sortWithinPartitions("parent_id"))

    def _tag(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        for pdf in batches:
            pdf = pdf.copy()
            pdf["pid"] = pid
            yield pdf

    # persist pins the sampled range boundaries: the bounds collect and
    # the starts pass must see the SAME partitioning (ids only — tiny)
    tagged = ranged.mapInPandas(_tag, "parent_id long, pid int").persist()
    bounds = {int(r["pid"]): int(r["mx"]) for r in
              tagged.groupBy("pid").agg(F.max("parent_id").alias("mx"))
                    .collect()}
    # previous non-empty partition's last parent, per pid (partitions are
    # range-ordered, so lower pid ⇒ strictly smaller ids)
    prev_last = {pid: max([v for p, v in bounds.items() if p < pid],
                          default=-1) for pid in bounds}

    def _with_starts(batches):
        # Arrow slices a partition into maxRecordsPerBatch-sized batches:
        # the first batch seeds from the PREVIOUS PARTITION's last parent,
        # every later batch from this partition's own previous batch —
        # same cross-batch carry as sources/ingest.assign_doc_ids.
        last = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("parent_id")
            if last is None:
                last = prev_last.get(int(pdf["pid"].iloc[0]), -1)
            pdf["start"] = (pdf["parent_id"].shift(1).fillna(last)
                            + 1).astype("int64")
            last = int(pdf["parent_id"].iloc[-1])
            yield pdf[["parent_id", "start"]]

    # localCheckpoint materializes the (tiny: two longs per parent)
    # interval table and truncates lineage, so the persisted ``tagged``
    # scan is released immediately instead of leaking executor storage
    # for the lifetime of the returned plan.
    iv = (tagged.mapInPandas(_with_starts, "parent_id long, start long")
          .localCheckpoint(eager=True))
    tagged.unpersist()
    return iv.withColumn(
        "b", F.explode(F.sequence(F.floor(F.col("start") / bucket),
                                  F.floor(F.col("parent_id") / bucket))))


def to_child_block_join(searcher, parent_query, parents_df: DataFrame,
                        doc_id_col: str = "doc_id",
                        bucket: int = 1024) -> DataFrame:
    """ToChildBlockJoinQuery (reference ``lucene/join/.../
    ToChildBlockJoinQuery.java:43``): match every CHILD document whose
    parent matches ``parent_query``; each child scores exactly its
    parent's score (the reference's ToChildBlockJoinScorer propagates
    parentScore to the block's children).

    Same block contract and interval machinery as
    :func:`to_parent_block_join` (children occupy (previous parent,
    parent)); the parent match set is the query's scored docs
    semi-restricted to the parent id list, children come from the
    reader's doc universe via the bucketed range join — no broadcast of
    either side required.

    Output: (doc_id child, parent_id, score float).
    """
    iv = _parent_intervals(parents_df, doc_id_col, bucket)
    pscores = (searcher.score_all(parent_query)
               .select(F.col(doc_id_col).alias("parent_id"), "score"))
    iv = iv.join(pscores, "parent_id")
    ch = (searcher.doc_meta.select(F.col(doc_id_col))
          .withColumn("b", F.floor(F.col(doc_id_col) / bucket)))
    return (ch.join(iv, on="b")
            .where((F.col(doc_id_col) >= F.col("start"))
                   & (F.col(doc_id_col) < F.col("parent_id")))
            .select(doc_id_col, "parent_id",
                    F.col("score").cast("float").alias("score")))


def sum_association_facets(searcher, query, dims_df: DataFrame,
                           dim_col: str, assoc_col: str,
                           doc_id_col: str = "doc_id") -> DataFrame:
    """TaxonomyFacetSumIntAssociations /
    TaxonomyFacetSumFloatAssociations role (reference ``lucene/facet/
    .../taxonomy/TaxonomyFacetSumIntAssociations.java:29``): per facet
    label, SUM a per-doc association value over the query's match set
    (instead of counting docs). One semi-join + one map-side-combined
    groupBy, like :func:`facet_counts`."""
    matched = searcher.matching_docs(query)
    return (matched
            .join(dims_df.select(doc_id_col, dim_col, assoc_col),
                  doc_id_col)
            .groupBy(dim_col)
            .agg(F.sum(F.col(assoc_col).cast("long")).alias("assoc_sum"),
                 F.count("*").alias("cnt")))


def facet_sum_value_source(searcher, query, dims_df: DataFrame,
                           dim_col: str, value_expr: str,
                           doc_id_col: str = "doc_id") -> DataFrame:
    """TaxonomyFacetSumValueSource role (reference ``lucene/facet/
    .../taxonomy/TaxonomyFacetSumValueSource.java:48-115``): per facet
    label, SUM an arbitrary DoubleValuesSource over the query's match
    set. The value source is any Catalyst SQL expression over the
    joined per-doc columns, including ``score`` (the
    DoubleValuesSource.SCORES role — the reference wires the scorer into
    the value source the same way). Same semi-join + map-side-combined
    groupBy shape as :func:`sum_association_facets`; the expression
    folds into the aggregation projection (whole-stage codegen)."""
    scored = searcher.score_all(query)
    return (scored
            .join(dims_df, doc_id_col)
            .groupBy(dim_col)
            .agg(F.sum(F.expr(value_expr).cast("double"))
                 .alias("value_sum"),
                 F.count("*").alias("cnt")))


def query_join(searcher, from_query, from_df: DataFrame, from_key: str,
               to_df: DataFrame, to_key: str,
               doc_id_col: str = "doc_id") -> DataFrame:
    """JoinUtil.createJoinQuery: gather the join-key values of docs
    matching ``from_query``, then select rows of ``to_df`` whose key is in
    that set — expressed as a semi-join so Catalyst picks broadcast vs
    shuffle by size (the reference's global-ordinals optimization is the
    broadcast case)."""
    keys = (searcher.matching_docs(from_query)
            .join(from_df.select(doc_id_col, from_key), doc_id_col)
            .select(F.col(from_key).alias(to_key)).distinct())
    return to_df.join(keys, to_key, "left_semi")


def group_facet_counts(searcher, query, dims_df: DataFrame,
                       group_col: str, facet_col: str,
                       doc_id_col: str = "doc_id",
                       facet_prefix: str | None = None,
                       min_count: int = 1, size: int | None = None,
                       order_by_count: bool = True,
                       include_missing: bool = False) -> DataFrame:
    """TermGroupFacetCollector role (reference
    ``grouping/TermGroupFacetCollector.java`` merged through
    ``GroupFacetCollector.mergeSegmentResults:?``): each facet value
    counts the number of UNIQUE groups that have at least one matching
    doc carrying it — a group contributes once per facet value no
    matter how many of its docs match. Entries below ``min_count`` drop,
    ``facet_prefix`` restricts values (the reference's startFacetOrd/
    endFacetOrd ord-range walk becomes a pushable startswith filter),
    ordering is (count DESC, value ASC) like orderByCountAndValue or
    value ASC, truncated to ``size`` (the reference's offset+limit).
    With ``include_missing`` a NULL-facet row carries the reference's
    totalMissingCount — unique groups having a matching doc with no
    facet value — exempt from prefix/minCount like the separate
    missing tally.

    Scale: the match set computes once; distinct (group, facet) pairs
    are one map-side-combined distinct, the per-facet tally one more
    partial aggregation — never a per-group facet re-scan. Returns
    ``(facet, cnt long, rank int)``."""
    matched = searcher.matching_docs(query)
    pairs = (matched
             .join(dims_df.select(doc_id_col, group_col, facet_col),
                   doc_id_col)
             .select(F.col(group_col).alias("_g"),
                     F.col(facet_col).alias("facet"))
             .distinct())
    entries = pairs.where(F.col("facet").isNotNull())
    if facet_prefix is not None:
        entries = entries.where(F.col("facet").startswith(facet_prefix))
    counts = (entries.groupBy("facet").agg(F.count("*").alias("cnt"))
              .where(F.col("cnt") >= int(min_count)))
    order = ([F.desc("cnt"), F.asc("facet")] if order_by_count
             else [F.asc("facet")])
    ranked = counts.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)))
    if size is not None:
        ranked = ranked.where(F.col("rank") <= int(size))
    if include_missing:
        missing = (pairs.where(F.col("facet").isNull())
                   .agg(F.count("*").alias("cnt"))
                   .select(F.lit(None).cast("string").alias("facet"),
                           "cnt", F.lit(0).alias("rank")))
        ranked = ranked.unionByName(missing)
    return ranked
