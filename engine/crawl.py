"""The crawl loop — each round is one DataFrame pipeline (SURVEY.md §3.2).

Per round, exactly the pinned semantics the refspec oracle implements
(refspec/crawler.py): anti-join the frontier against the seen set, robots
gate, per-host top-B(host) selection under a total order, fetch = join
against the pages index, Arrow-UDF text/link extraction, lineage append,
lattice-merged frontier advance, manifest-last snapshot commit.

Scale notes (the 10^10 story, SURVEY.md §4):
- Shuffles per round: anti-join exchange on url_hash, politeness window
  exchange on (host, salt) then host, frontier-merge exchange on url_hash.
  With frontier+seen stored bucketed by url_hash (Iceberg bucket(url_hash))
  the url_hash exchanges become storage-partitioned no-ops.
- The pages index join keys on url_hash; at cluster scale pages is bucketed
  the same way.  Only (url_hash, html) for the ≤ Σ B(host) SELECTED rows
  per round crosses the wire — html is pruned everywhere else.
- fetch_seq uses a single-partition window over the per-round SELECTED set
  (bounded by Σ B(host), i.e. politeness-budget-sized, NOT frontier-sized)
  — per-round selected sets are orders of magnitude smaller than the
  frontier, so this is safe at scale; the frontier itself never passes
  through a global window.
- The optional bloom pre-filter (engine/filters.py) prunes the anti-join
  probe side; the exact anti-join stays authoritative (filters prune,
  never decide).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import (
    DataFrame,
    Observation,
    SparkSession,
    Window,
    functions as F,
)

from engine.frontier import (
    SEEN_SCHEMA,
    frontier_from_seeds,
    merge_frontier,
    with_host,
)
from engine.politeness import select_top_b
from engine.robots import robots_gate
from engine.snapstore import SnapStore
from engine.udfs import compress_html_udf, extract_both_z_udf, hash64_udf


@dataclass(frozen=True)
class EngineConfig:
    default_budget: int = 2
    budget_overrides: dict[str, int] = field(default_factory=dict)
    max_rounds: int = 100
    salt: int = 8  # politeness-window salt groups (1 = single-phase)


class static_planning:
    """Context manager: disable adaptive query execution for the crawl
    loop, restoring the previous setting on exit.

    Every crawl exchange is explicitly pinned by design (repartition /
    bucket-analog partitioning; see the module docstring), so AQE's
    partition coalescing is inert here, and its skew handling is
    superseded by the host-salted politeness window — the crawl's designed
    skew strategy.  What AQE still costs is real and linear in rounds:
    each adaptive query stage is materialized job-by-job with a
    driver-serial replan between stages, a fixed per-round latency that
    erodes wide-executor scaling (Amdahl) — measured 1.1-2.0 s/round at
    local[16] (10-20% of a round), a wash at local[4].  Repeated
    fixed-shape production plans want static planning; AQE stays the
    engine default for the ad-hoc/ops suite (engine/session.py), where
    data-dependent skew (minhash buckets, host rollups) is real.

    The override mutates shared SparkSession state: run_crawl assumes
    exclusive use of its session while it runs (concurrent ad-hoc queries
    on the same session would silently run with AQE off — give them their
    own ``spark.newSession()``).  Not reentrant: nesting would restore the
    inner manager's captured value, i.e. "false".
    """

    KEY = "spark.sql.adaptive.enabled"

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        # Distinguish "explicitly set on this session" from "inheriting the
        # default": restoring an inherited default as an explicit value
        # would pin it for the rest of the session even on deployments
        # whose build default differs.  RuntimeConfig.isModifiable can't
        # tell us; unset-then-probe can — SQL confs always resolve to
        # their effective default once unset.
        self.prev = self.spark.conf.get(self.KEY, None)
        self.spark.conf.unset(self.KEY)
        self.default = self.spark.conf.get(self.KEY)
        self.was_explicit = (
            self.prev is not None and self.prev != self.default
        )
        self.spark.conf.set(self.KEY, "false")
        return self

    def __exit__(self, *exc):
        if self.was_explicit:
            self.spark.conf.set(self.KEY, self.prev)
        else:
            self.spark.conf.unset(self.KEY)
        return False


def _global_seq_by_url(
    slim: DataFrame, offset: int, n_par: int
) -> tuple[DataFrame, DataFrame]:
    """Dense global rank over ``url`` without a single-partition window.

    Phase 1: range-partition by url (partitions are ordered slices of the
    url domain).  Phase 2: row_number within each partition (parallel).
    Phase 3: add each partition's cumulative base — a P-row collect on the
    persisted range-partitioned frame, folded in as a literal map.
    fetch_seq = offset + base[pid] + local_rank - 1 == offset + global rank
    by url, independent of where the range sampler places the boundaries.

    ``slim`` should be a narrow (url, url_hash) projection: only those two
    columns cross the range exchange; the caller joins fetch_seq back on
    url_hash (1:1 — frontier rows are unique per url_hash), so wide columns
    (text, links) never move for the rank.  The range-partitioned frame is
    PERSISTED before the counts collect so the counts job and the caller's
    later write observe the SAME boundaries and pid assignment — without
    the pin, a cache eviction between the two jobs could re-sample
    different range boundaries and mis-base the ranks.  Returns
    (seq=(url_hash, fetch_seq), rp_handle_to_unpersist).
    """
    rp = (
        slim.repartitionByRange(n_par, "url")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = rp.groupBy("_pid").count().collect()
    base: dict[int, int] = {}
    acc = offset
    for row in sorted(counts, key=lambda r: r["_pid"]):
        base[row["_pid"]] = acc
        acc += row["count"]
    kv = []
    for pid, b in sorted(base.items()):
        kv += [F.lit(pid), F.lit(b)]
    base_col = (
        F.create_map(*kv)[F.col("_pid")] if kv else F.lit(offset)
    )
    w_local = Window.partitionBy("_pid").orderBy("url")
    seq = rp.select(
        "url_hash",
        (base_col + F.row_number().over(w_local) - 1)
        .cast("long")
        .alias("fetch_seq"),
    )
    return seq, rp


def pages_index(pages: DataFrame) -> DataFrame:
    """url_hash + as-of snapshot resolution (SURVEY.md §2 C5): keep, per
    url, the row with the greatest warc_ts.  One shuffle on url_hash; on a
    cluster this index is computed once and stored bucketed by url_hash.

    The body column is stored COMPRESSED (html_z = zlib-1, the WARC-gzip
    convention real crawl stores use): the index-build shuffle, the cache,
    every round's fetch join, and the Arrow hop to the extractor all move
    ~10x fewer bytes, and only the extractor inflates the selected pages
    (engine/udfs.extract_both_z_udf).  Profiling the uncompressed design
    showed the wide-parallelism ceiling was exactly this: each round
    materialized EVERY cached html value through the join's cache scan
    (UnsafeRow.getBinary/copyMemory dominated JFR samples) to fetch <=16%
    of them, saturating the memory subsystem at high core counts.

    The trailing explicit repartition pins HashPartitioning(url_hash, P)
    on the output (AQE would otherwise coalesce it away at persist time):
    when the caller persists this index, every round's fetch join sees a
    cached side that already satisfies its distribution requirement, so
    the html column NEVER crosses a shuffle after the one-time build —
    only the politeness-budget-sized selected set shuffles per round.
    This is the local analog of storing pages bucketed by url_hash in
    Iceberg (storage-partitioned join)."""
    spark = pages.sparkSession
    n_par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    h = (
        pages.withColumn("url_hash", hash64_udf("url"))
        .withColumn("html_z", compress_html_udf("html"))
        .drop("html")
    )
    w = Window.partitionBy("url_hash").orderBy(
        F.col("warc_ts").desc(), F.col("url").asc()
    )
    return (
        h.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .repartition(n_par, "url_hash")
    )


def bootstrap(
    spark: SparkSession, store: SnapStore, seeds: DataFrame
) -> None:
    """Commit snapshot 0: seeded frontier + empty seen.  The frontier row
    count rides the write as an observed metric so the crawl loop never
    needs a separate count job to decide whether to run a round."""
    frontier0 = frontier_from_seeds(seeds)
    fobs = Observation()
    frontier0 = frontier0.observe(
        fobs, F.count(F.lit(1)).alias("frontier_rows")
    )
    seen0 = spark.createDataFrame([], SEEN_SCHEMA)
    store.commit_state(
        0,
        {"frontier": frontier0, "seen": seen0},
        {"round": -1, "fetch_seq_end": 0, "n_seen_end": 0},
        metrics_fn=lambda: {
            "frontier_rows": int(fobs.get["frontier_rows"] or 0)
        },
    )


def run_round(
    spark: SparkSession,
    store: SnapStore,
    rnd: int,
    pages_idx: DataFrame,
    robots: DataFrame,
    cfg: EngineConfig,
    fetch_seq_offset: int,
    seen_filter=None,
) -> dict:
    """Execute round ``rnd`` from snapshot ``rnd`` to snapshot ``rnd+1``.

    Returns the metrics dict that was committed with the snapshot.
    ``seen_filter`` optionally wraps the anti-join probe side with a bloom
    pre-filter (engine/filters.bloom_prune) — correctness-neutral.

    Spark-job budget per round (the scaling-efficiency lever — idle-core
    gaps between jobs are what erode efficiency as cores grow): ONE
    materialization job (the fetch_seq partition-counts collect, which
    fills the ext/tagged caches), then the four table writes submitted in
    PARALLEL with all round metrics observed on the writes themselves —
    no separate aggregation, no per-round lineage count, no frontier
    empty-check job (both ride the manifest).
    """
    frontier = store.read(spark, "frontier", rnd)
    seen = store.read(spark, "seen", rnd)

    # 1. candidates := frontier ANTI seen (op C1).  With a bloom filter the
    # probe side splits: `_maybe_seen` rows take the exact anti-join,
    # provably-unseen rows skip it (no false negatives ⇒ identical result —
    # filters prune, never decide; equivalence-tested in tests/test_filters).
    seen_keys = seen.select("url_hash")
    if seen_filter is not None:
        tagged0 = seen_filter(frontier)
        maybe = tagged0.filter(F.col("_maybe_seen")).drop("_maybe_seen")
        definite = tagged0.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
        cand = maybe.join(seen_keys, "url_hash", "left_anti").unionByName(
            definite
        )
    else:
        cand = frontier.join(seen_keys, "url_hash", "left_anti")

    # 2. robots gate (op B4): blocked rows exit to seen, no lineage.
    # PERSISTED: the politeness path (allowed) and the seen delta (blocked)
    # both read it, so the anti-join + gate run once per round, not twice.
    tagged = robots_gate(cand, robots).persist()
    blocked = tagged.filter(F.col("robots_blocked")).drop("robots_blocked")
    allowed = tagged.filter(~F.col("robots_blocked")).drop("robots_blocked")

    # 3. politeness: per-host top-B under the pinned total order (op G1)
    selected = select_top_b(
        allowed, cfg.default_budget, cfg.budget_overrides, cfg.salt
    )

    # 4. fetch = left join pages index on url_hash (ops C4/C5).  The
    # selected side is repartitioned to HashPartitioning(url_hash, P)
    # FIRST, for two reasons: (a) it matches the persisted pages index's
    # pinned partitioning, so the join needs no exchange on the html side;
    # (b) the fetch batch is politeness-budget-sized (small in BYTES), and
    # AQE's byte-based coalescing would otherwise shrink it to a few
    # partitions and serialize the CPU-bound Arrow extraction downstream —
    # UDF stages are CPU-sized, not byte-sized.
    n_par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    fetched = selected.repartition(n_par, "url_hash").join(
        pages_idx.select("url_hash", "html_z"), "url_hash", "left"
    )

    # 5. Arrow-UDF extraction (ops F3/F4 fused — engine/pure.py
    # extract_text_and_links): the COMPRESSED body crosses to Python once,
    # is inflated and PARSED once per page, then dropped immediately
    ext = (
        fetched.withColumn("_eb", extract_both_z_udf("html_z", "url"))
        .withColumn(
            "status",
            F.when(F.col("html_z").isNotNull(), F.lit("200")).otherwise(
                F.lit("404")
            ),
        )
        .withColumn("partition_id", F.spark_partition_id())
        .withColumn("text", F.col("_eb.text"))
        .withColumn("links", F.col("_eb.links"))
        .drop("html_z", "_eb")
    )
    ext = ext.persist()

    # 6. lineage with dense fetch_seq = global rank by url.  NOT a
    # single-partition Window.orderBy (that serializes the whole selected
    # set through one task — an OOM at cluster-scale budgets): range-
    # partition a SLIM (url, url_hash) projection, rank locally per
    # partition, add per-partition base offsets (one P-row count job on the
    # persisted slim frame — this is the round's single materialization
    # job, which also fills the ext/tagged caches), then join fetch_seq
    # back 1:1 on the url_hash partitioning ext already carries — the wide
    # text/links columns never cross the range exchange.
    seq, rp_slim = _global_seq_by_url(
        ext.select("url", "url_hash"), fetch_seq_offset, n_par
    )
    lineage = (
        ext.join(seq.repartition(n_par, "url_hash"), "url_hash")
        .select(
            F.lit(rnd).alias("round"),
            "partition_id",
            "host",
            "url_hash",
            "url",
            "status",
            F.when(F.col("links").isNull(), 0)
            .otherwise(F.size("links"))
            .alias("n_links"),
            F.when(F.col("text").isNull(), 0)
            .otherwise(F.octet_length("text"))
            .alias("text_bytes"),
            "fetch_seq",
        )
    )
    # round metrics observe the lineage WRITE — no separate agg job.
    # (n_hosts is approx_count_distinct: observed metrics cannot contain
    # distinct aggregates; it is a monitoring figure, never compared.)
    obs = Observation()
    lineage = lineage.observe(
        obs,
        F.count(F.lit(1)).alias("n_selected"),
        F.sum(F.when(F.col("status") == "200", 1).otherwise(0)).alias(
            "n_200"
        ),
        F.sum("n_links").alias("n_links"),
        F.sum("text_bytes").alias("text_bytes"),
        F.approx_count_distinct("host").alias("n_hosts"),
    )

    # 7. advance state.  `removed` is selected ∪ robots-blocked — cheap
    # projections over the ext/tagged caches.  The seen table is
    # APPEND-only: this round commits just `seen_delta` (O(round), not
    # O(crawl history)).
    removed = ext.select("url_hash", "url").unionByName(
        blocked.select("url_hash", "url")
    )
    seen_delta = removed.withColumn("fetched_round", F.lit(rnd)).select(
        "url_hash", "url", "fetched_round"
    )
    seen_next = seen.unionByName(seen_delta)
    # cumulative seen size rides the manifest (n_seen_end) so the adaptive
    # filter engage rule (engine/filters.adaptive_seen_filter_factory) is
    # an O(1) JSON read, never a seen-table count.  Chain from the
    # previous manifest; stores written before the metric existed pay one
    # count job, then the chain self-heals.
    n_seen_prev = (store.manifest(rnd).get("metrics") or {}).get("n_seen_end")
    if n_seen_prev is None:
        n_seen_prev = seen.select("url_hash").count()
    sobs = Observation()
    seen_delta_w = seen_delta.observe(
        sobs, F.count(F.lit(1)).alias("n_seen_delta")
    )

    kids = (
        ext.filter(F.col("status") == "200")
        .select(
            F.col("url").alias("src_url"),
            F.greatest(F.lit(0), F.col("priority") - 1).alias("priority"),
            (F.col("depth") + 1).alias("depth"),
            F.explode("links").alias("url"),
        )
        # the canon+hash UDF runs MAP-SIDE on the exploded links: ext is
        # already hash-spread across n_par partitions (step 4's repartition
        # on url_hash), so per-partition link counts are balanced and no
        # exchange is needed before the UDF — the exploded stream crosses
        # exactly ONE shuffle (the url_hash exchange feeding the anti-join
        # and frontier lattice merge below), not two.  (An earlier revision
        # repartitioned by url here; that predates ext's even
        # pre-partitioning and doubled the widest per-round shuffle.)
        .withColumn("url_hash", hash64_udf("url"))
    )
    kids = with_host(kids).select(
        "url_hash",
        "url",
        "host",
        "priority",
        "depth",
        F.lit(rnd + 1).alias("discovered_round"),
        "src_url",
    )
    kids = kids.join(seen_next.select("url_hash"), "url_hash", "left_anti")

    survivors = frontier.join(
        removed.select("url_hash"), "url_hash", "left_anti"
    )
    frontier_next = merge_frontier(survivors.unionByName(kids))
    # the next round's empty-check rides this write as an observed metric
    fobs = Observation()
    frontier_next = frontier_next.observe(
        fobs, F.count(F.lit(1)).alias("frontier_rows")
    )

    # pages_out: the extracted-text artifact (byte-identity invariant,
    # BASELINE.json:15 — compared verbatim against refspec texts)
    pages_out = ext.filter(F.col("status") == "200").select(
        F.lit(rnd).alias("round"), "url_hash", "url", "text"
    )

    # round metrics into the snapshot manifest (B:14 "lineage + metrics") —
    # harvested from the write-side observations after the parallel table
    # writes land, before the manifest rename.  fetch_seq_end carries the
    # cumulative lineage row count forward so the next round's offset is a
    # manifest read, never an O(crawl-history) lineage scan.
    def _metrics() -> dict:
        m = obs.get
        n_selected = int(m["n_selected"] or 0)
        return {
            "round": rnd,
            "n_selected": n_selected,
            "n_200": int(m["n_200"] or 0),
            "n_404": n_selected - int(m["n_200"] or 0),
            "n_links": int(m["n_links"] or 0),
            "text_bytes": int(m["text_bytes"] or 0),
            "n_hosts": int(m["n_hosts"] or 0),
            "frontier_rows": int(fobs.get["frontier_rows"] or 0),
            "fetch_seq_end": fetch_seq_offset + n_selected,
            "n_seen_end": n_seen_prev + int(sobs.get["n_seen_delta"] or 0),
        }

    # store-backed seen filters (engine/filters.StoreBloomFilter /
    # StoreCuckooFilter) commit their per-round shard update with the
    # snapshot — executor-side, no shard bytes through the driver
    extra_tables = (
        seen_filter.delta_tables(seen_delta, seen_next)
        if seen_filter is not None and hasattr(seen_filter, "delta_tables")
        else {}
    )
    metrics = store.commit_state(
        rnd + 1,
        {
            "frontier": frontier_next,
            "seen": seen_delta_w,
            "lineage": lineage,
            "pages_out": pages_out,
            **extra_tables,
        },
        metrics_fn=_metrics,
        parallel=True,
    )
    ext.unpersist()
    tagged.unpersist()
    rp_slim.unpersist()
    return metrics


def _fetch_seq_offset(spark: SparkSession, store: SnapStore, sid: int) -> int:
    """Rows already in lineage at snapshot sid (0 if none).

    The cumulative count is carried in each snapshot's manifest metrics
    (``fetch_seq_end``), so per-round this is a JSON field read — O(1),
    not an O(crawl-history) lineage scan.  Stores written before the
    metric existed fall back to the authoritative count.
    """
    m = store.manifest(sid).get("metrics") or {}
    if "fetch_seq_end" in m:
        return int(m["fetch_seq_end"])
    try:
        return store.read(spark, "lineage", sid).count()
    except FileNotFoundError:
        return 0


def run_crawl(
    spark: SparkSession,
    store: SnapStore,
    pages: DataFrame,
    robots: DataFrame,
    seeds: DataFrame | None,
    cfg: EngineConfig,
    seen_filter_factory=None,
) -> int:
    """Run (or resume — SURVEY.md §3.4) the crawl to completion.

    If the store has no committed snapshot, seeds bootstrap snapshot 0;
    otherwise the loop re-enters after the latest committed snapshot —
    a kill between data write and manifest write of round r simply re-runs
    round r (orphan dirs are overwritten; lineage never double-counts
    because visibility is manifest-gated).  Returns rounds executed.
    """
    if store.latest() is None:
        if seeds is None:
            raise ValueError("empty store and no seeds")
        bootstrap(spark, store, seeds)
    else:
        # resume: a kill between data write and manifest write left
        # invisible orphan data dirs — reclaim them before re-running
        store.gc_orphans()

    # the pages index (url_hash + as-of dedup) is round-invariant: compute
    # once, keep it cached across rounds (cluster analog: stored bucketed)
    pages_idx = pages_index(pages).persist()
    rounds_done = 0
    try:
        with static_planning(spark):
            while True:
                sid = store.latest()
                rnd = sid  # next round number == current snapshot id
                if rnd >= cfg.max_rounds:
                    break
                # empty-check from the previous round's observed metric;
                # count() fallback only for stores written before the
                # metric existed
                m_prev = store.manifest(sid).get("metrics") or {}
                frontier_rows = m_prev.get("frontier_rows")
                if frontier_rows is None:
                    frontier_rows = (
                        store.read(spark, "frontier", sid).limit(1).count()
                    )
                if frontier_rows == 0:
                    break
                seen_filter = (
                    seen_filter_factory(spark, store, sid)
                    if seen_filter_factory
                    else None
                )
                run_round(
                    spark,
                    store,
                    rnd,
                    pages_idx,
                    robots,
                    cfg,
                    _fetch_seq_offset(spark, store, sid),
                    seen_filter,
                )
                rounds_done += 1
    finally:
        # same exceptional paths that restore the AQE conf also release
        # the cached pages index (long-lived sessions would leak it)
        pages_idx.unpersist()
    return rounds_done


def fetch_log(spark: SparkSession, store: SnapStore, sid: int | None = None) -> DataFrame:
    """(round, url, status, host) ordered by (round, url) — the crawl
    ordering artifact compared against refspec (op H1 order_fetch_log)."""
    lin = store.read(spark, "lineage", sid)
    return lin.select("round", "url", "status", "host").orderBy("round", "url")
