"""Relational operators over the driver tables (SURVEY.md §2 groups A-D, G, H).

Every op here is pure DataFrame API — no UDFs, no RDDs — so Catalyst gets
full pushdown/pruning and whole-stage codegen.  Each maps 1:1 onto the
crawl-pipeline operator named in SURVEY.md §2 (the TPC-H-ish tables stand
in as the oracle corpus, SURVEY.md §5.1).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from engine.io import load_table
from engine.ops import op
from engine.ops.goldens import golden_oracle as _golden

# --------------------------------------------------------------------- A


@op(
    "scan_pages",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "A",
)
def scan_pages(spark, sf):
    # column-pruned scan: ReadSchema must contain only these three columns
    return load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@op(
    "scan_sitemaps",
    "SELECT source AS host, 'http://' || source || '.test/d/' "
    "|| CAST(doc_id AS VARCHAR) AS url FROM documents",
    "A",
)
def scan_sitemaps(spark, sf):
    # Sitemap-XML seed discovery (SURVEY.md §2 A — the third seed source
    # next to seed lists and robots.txt): build one sitemap per host, then
    # harvest <loc> entries ENTIRELY JVM-side — regexp_extract_all +
    # explode, zero Python — so sitemap ingestion at crawl scale is a
    # codegen'd scan, not a UDF stage.  The op round-trips build→parse;
    # the oracle is the closed-form URL set, so any parse drift
    # (truncation, entity handling, ordering) breaks the hash compare.
    docs = load_table(spark, sf, "documents")
    entry = F.concat(
        F.lit("<url><loc>http://"),
        F.col("source"),
        F.lit(".test/d/"),
        F.col("doc_id").cast("string"),
        F.lit("</loc></url>"),
    )
    sitemaps = docs.groupBy(F.col("source").alias("host")).agg(
        F.concat(
            F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
            F.array_join(F.array_sort(F.collect_list(entry)), ""),
            F.lit("</urlset>"),
        ).alias("xml")
    )
    locs = F.regexp_extract_all("xml", F.lit("<loc>([^<]+)</loc>"), 1)
    return sitemaps.select("host", F.explode(locs).alias("url"))


# --------------------------------------------------------------------- B


@op("project_prune", "SELECT o_orderkey, o_orderstatus FROM orders", "B")
def project_prune(spark, sf):
    return load_table(spark, sf, "orders").select("o_orderkey", "o_orderstatus")


@op(
    "filter_lang",
    "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'",
    "B",
)
def filter_lang(spark, sf):
    return (
        load_table(spark, sf, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "lang", "n_chars")
    )


@op(
    "filter_status",
    "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem "
    "WHERE l_returnflag IN ('A','R')",
    "B",
)
def filter_status(spark, sf):
    return (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    )


@op(
    "robots_gate",
    "SELECT doc_id FROM documents "
    "WHERE NOT (text LIKE 'key%' OR text LIKE 'win%')",
    "B",
)
def robots_gate_op(spark, sf):
    # the crawl gate's shape: higher-order `exists` over a prefix array
    # (engine/robots.py); oracle is the unrolled OR of LIKE prefixes
    docs = load_table(spark, sf, "documents")
    prefixes = F.array(F.lit("key"), F.lit("win"))
    blocked = F.exists(prefixes, lambda d: F.col("text").startswith(d))
    return docs.filter(~blocked).select("doc_id")


@op(
    "derive_host",
    "SELECT doc_id, regexp_extract('http://' || source || '.test/d/' || doc_id, "
    "'^[a-z]+://([^/]+)', 1) AS host FROM documents",
    "B",
)
def derive_host(spark, sf):
    docs = load_table(spark, sf, "documents")
    url = F.concat(
        F.lit("http://"), F.col("source"), F.lit(".test/d/"), F.col("doc_id")
    )
    return docs.select(
        "doc_id", F.regexp_extract(url, r"^[a-z]+://([^/]+)", 1).alias("host")
    )


@op(
    "derive_priority",
    "SELECT l_orderkey, l_linenumber, GREATEST(0, l_linenumber - 1) AS priority "
    "FROM lineitem",
    "B",
)
def derive_priority(spark, sf):
    return load_table(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(F.lit(0), F.col("l_linenumber") - 1).alias("priority"),
    )


@op(
    "trap_guard",
    "SELECT doc_id, depth, is_trap FROM ("
    "SELECT doc_id, len(string_split(path, '/')) - 1 AS depth, "
    "(len(string_split(path, '/')) - 1 > 8) OR "
    "(len(string_split(path, '/')) - 1 "
    " - len(list_distinct(list_filter(string_split(path, '/'), s -> s <> ''))) "
    " >= 3) AS is_trap FROM ("
    "SELECT doc_id, '/' || source || '/' || "
    "repeat('p' || CAST(doc_id % 3 AS VARCHAR) || '/', CAST(doc_id % 12 AS INT)) "
    "|| 'd' || CAST(doc_id AS VARCHAR) AS path FROM documents))",
    "B",
)
def trap_guard(spark, sf):
    # Crawler-trap classifier (SURVEY.md §2 B — frontier hygiene): a URL
    # path is trap-suspect when it is pathologically deep (> 8 segments:
    # calendar/faceted-navigation explosions) or when path segments repeat
    # (>= 3 duplicate segments: session-id / symlink loops).  Pure JVM
    # higher-order functions — split / filter / array_distinct — so the
    # gate runs inside whole-stage codegen ahead of the politeness window
    # and prunes frontier rows before any shuffle.  Paths are synthesized
    # deterministically from the documents table (same convention as
    # derive_host).
    docs = load_table(spark, sf, "documents")
    path = F.concat(
        F.lit("/"),
        F.col("source"),
        F.lit("/"),
        F.expr(
            "repeat('p' || CAST(doc_id % 3 AS STRING) || '/', "
            "CAST(doc_id % 12 AS INT))"
        ),
        F.lit("d"),
        F.col("doc_id").cast("string"),
    )
    segs = F.split(path, "/")
    depth = (F.size(segs) - F.lit(1)).alias("depth")
    distinct_ct = F.size(F.array_distinct(F.filter(segs, lambda s: s != "")))
    is_trap = ((F.size(segs) - 1 > 8) | ((F.size(segs) - 1 - distinct_ct) >= 3)).alias(
        "is_trap"
    )
    return docs.select("doc_id", depth, is_trap)


# --------------------------------------------------------------------- C


@op(
    "anti_join_seen",
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE NOT EXISTS "
    "(SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')",
    "C",
)
def anti_join_seen(spark, sf):
    li = load_table(spark, sf, "lineitem")
    seen = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    return li.join(
        seen, li.l_orderkey == seen.o_orderkey, "left_anti"
    ).select("l_orderkey", "l_linenumber")


@op(
    "semi_join_pages",
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE EXISTS "
    "(SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_orderstatus = 'O')",
    "C",
)
def semi_join_pages(spark, sf):
    li = load_table(spark, sf, "lineitem")
    live = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey")
    )
    return li.join(
        live, li.l_orderkey == live.o_orderkey, "left_semi"
    ).select("l_orderkey", "l_linenumber")


@op(
    "broadcast_join_robots",
    "SELECT n_name, count(*) AS cnt, round(sum(c_acctbal), 4) AS sum_bal "
    "FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name",
    "C",
)
def broadcast_join_robots(spark, sf):
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")  # dim-sized, like robots
    return (
        cust.join(
            F.broadcast(nation),
            cust.c_nationkey == nation.n_nationkey,
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("c_acctbal"), 4).alias("sum_bal"),
        )
    )


@op(
    "equi_join_fetch",
    "SELECT l_orderkey, l_linenumber, o_orderstatus, o_totalprice "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey",
    "C",
)
def equi_join_fetch(spark, sf):
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    return li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_orderstatus", "o_totalprice"
    )


@op(
    "asof_join_latest",
    "SELECT user_id, event_id AS last_event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch "
    "FROM (SELECT user_id, event_id, ts, row_number() OVER "
    "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
    "FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1",
    "C",
)
def asof_join_latest(spark, sf):
    # the pages-index as-of pattern (engine/crawl.pages_index): greatest
    # event at-or-before the cutoff, per key, via a total-ordered window
    ev = load_table(spark, sf, "events").filter(
        F.col("ts") <= F.lit("2024-01-15 00:00:00").cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
    )


@op(
    "range_join_events",
    "SELECT a.event_id AS e1, b.event_id AS e2 FROM events a JOIN events b "
    "ON a.user_id = b.user_id AND b.ts > a.ts "
    "AND b.ts <= a.ts + INTERVAL 1 DAY",
    "C",
)
def range_join_events(spark, sf):
    # interval join with an equi-key (user_id) so Spark plans a hash/sort-
    # merge join + range filter, never a nested loop (SURVEY.md §2 C)
    ev = load_table(spark, sf, "events").select("user_id", "event_id", "ts")
    a = ev.alias("a")
    b = ev.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 DAY"))
    )
    return a.join(b, cond).select(
        F.col("a.event_id").alias("e1"), F.col("b.event_id").alias("e2")
    )


@op(
    "redirect_resolve",
    "SELECT doc_id, doc_id - (doc_id % 5) AS final_doc, "
    "CAST(doc_id % 5 AS INT) AS hops FROM documents",
    "C",
)
def redirect_resolve(spark, sf):
    # Redirect-chain resolution by POINTER DOUBLING (Wyllie-style pointer
    # jumping): each iteration composes the partial-resolution function
    # with itself — f'(x) = f(f(x)) — via a hash self-join, so a chain of
    # length L resolves in ceil(log2 L) shuffle rounds instead of L
    # (Spark has no recursive CTE; the naive one-hop loop is O(L) rounds
    # and at web scale L-bounded-but-unknown chains make that the wrong
    # plan).  Terminals are modeled as self-loops so composition is a
    # fixpoint: extra rounds are no-ops on resolved rows.  Browsers cap
    # redirect chains at ~20 hops, so 5 doubling rounds cover any real
    # chain; here chains have length <= 4 (doc_id walks down to the
    # nearest multiple of 5) and 3 rounds suffice.  `hops` carries chain
    # length through the composition (hop' = hop + hop∘f).
    docs = load_table(spark, sf, "documents").select("doc_id")
    terminal = F.col("doc_id") % 5 == 0
    f = docs.select(
        F.col("doc_id").alias("src"),
        F.when(terminal, F.col("doc_id")).otherwise(F.col("doc_id") - 1).alias("nxt"),
        F.when(terminal, F.lit(0)).otherwise(F.lit(1)).alias("hops"),
    )
    for _ in range(3):
        a, b = f.alias("a"), f.alias("b")
        f = a.join(b, F.col("a.nxt") == F.col("b.src")).select(
            F.col("a.src").alias("src"),
            F.col("b.nxt").alias("nxt"),
            (F.col("a.hops") + F.col("b.hops")).alias("hops"),
        )
    return f.select(
        F.col("src").alias("doc_id"),
        F.col("nxt").alias("final_doc"),
        F.col("hops").cast("int").alias("hops"),
    )


@op(
    "link_rank",
    "WITH n AS (SELECT COUNT(*) AS n FROM documents), "
    "e AS (SELECT doc_id AS src, doc_id % 100 AS dst FROM documents), "
    "r0 AS (SELECT doc_id, 1.0 / (SELECT n FROM n) AS r FROM documents), "
    "r1 AS (SELECT d.doc_id, 0.15 / (SELECT n FROM n) "
    " + 0.85 * COALESCE(SUM(r0.r), 0) AS r "
    " FROM documents d LEFT JOIN e ON e.dst = d.doc_id "
    " LEFT JOIN r0 ON r0.doc_id = e.src GROUP BY d.doc_id), "
    "r2 AS (SELECT d.doc_id, 0.15 / (SELECT n FROM n) "
    " + 0.85 * COALESCE(SUM(r1.r), 0) AS r "
    " FROM documents d LEFT JOIN e ON e.dst = d.doc_id "
    " LEFT JOIN r1 ON r1.doc_id = e.src GROUP BY d.doc_id), "
    "r3 AS (SELECT d.doc_id, 0.15 / (SELECT n FROM n) "
    " + 0.85 * COALESCE(SUM(r2.r), 0) AS r "
    " FROM documents d LEFT JOIN e ON e.dst = d.doc_id "
    " LEFT JOIN r2 ON r2.doc_id = e.src GROUP BY d.doc_id) "
    "SELECT doc_id, ROUND(r, 7) AS rank FROM r3",
    "C",
)
def link_rank(spark, sf):
    # Link-graph priority refresh (north_star: 'priority queue'): 3 fixed
    # power iterations of PageRank (d=0.85) over the link graph, each
    # iteration one aggregate-then-join round — the OPIC/PageRank signal
    # real crawlers feed back into frontier priority.  Every join is
    # equi-keyed on the node id, so at 10^10 nodes each iteration is one
    # hash-partitioned shuffle reusing the same key partitioning (zero
    # plan change per iteration); N arrives via a broadcast 1-row scalar
    # cross-join (Spark's canonical scalar plan: BroadcastNestedLoopJoin
    # over an IdentityBroadcastMode 1-row build — constant work however
    # large the probe side), not a driver collect.  The plan test pins
    # that EVERY nested loop in this plan is that scalar broadcast and
    # all data-scale joins are hash/merge.  Contribution = r/outdeg; the
    # synthetic graph has outdeg 1 everywhere (each doc links to
    # doc_id % 100), varied IN-degree, so the oracle is 3 chained SQL
    # aggregation CTEs.
    docs = load_table(spark, sf, "documents").select("doc_id")
    n1 = F.broadcast(docs.agg(F.count("*").alias("n")))
    docs_n = docs.crossJoin(n1)
    edges = docs.select(
        F.col("doc_id").alias("src"), (F.col("doc_id") % 100).alias("dst")
    )
    r = docs_n.select("doc_id", (F.lit(1.0) / F.col("n")).alias("r"))
    for _ in range(3):
        contrib = (
            edges.join(r, edges.src == r.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.sum("r").alias("in_r"))
        )
        r = docs_n.join(contrib, "doc_id", "left").select(
            "doc_id",
            (
                F.lit(0.15) / F.col("n")
                + F.lit(0.85) * F.coalesce(F.col("in_r"), F.lit(0.0))
            ).alias("r"),
        )
    return r.select("doc_id", F.round("r", 7).alias("rank"))


# --------------------------------------------------------------------- D


@op(
    "agg_host_counts",
    "SELECT l_returnflag, l_linestatus, count(*) AS cnt_rows, "
    "round(sum(l_quantity), 4) AS sum_qty, "
    "round(avg(l_extendedprice), 4) AS avg_price "
    "FROM lineitem GROUP BY l_returnflag, l_linestatus",
    "D",
)
def agg_host_counts(spark, sf):
    return (
        load_table(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt_rows"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
    )


@op(
    "agg_distinct_hosts",
    "SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust "
    "FROM orders GROUP BY o_orderstatus",
    "D",
)
def agg_distinct_hosts(spark, sf):
    return (
        load_table(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_cust"))
    )


@op("approx_frontier_card", _golden("approx_frontier_card"), "D")
def approx_frontier_card(spark, sf):
    # HLL round telemetry (SURVEY.md §2 D3); value is approximate so no
    # value-hash oracle — pytest bounds its error vs the exact count
    return (
        load_table(spark, sf, "lineitem")
        .agg(F.approx_count_distinct("l_orderkey").alias("approx_orders"))
    )


@op(
    "rollup_metrics",
    "SELECT l_returnflag, l_linestatus, count(*) AS cnt, "
    "round(sum(l_extendedprice), 4) AS sum_price "
    "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)",
    "D",
)
def rollup_metrics(spark, sf):
    return (
        load_table(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        )
    )


@op(
    "pivot_status",
    "SELECT CAST(user_id % 8 AS INT) AS cohort, "
    "round(sum(CASE WHEN event_type = 'click' THEN value END), 4) AS click, "
    "round(sum(CASE WHEN event_type = 'error' THEN value END), 4) AS error, "
    "round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase, "
    "round(sum(CASE WHEN event_type = 'signup' THEN value END), 4) AS signup, "
    "round(sum(CASE WHEN event_type = 'view' THEN value END), 4) AS view "
    "FROM events GROUP BY cohort",
    "D",
)
def pivot_status(spark, sf):
    # Wide-format status matrix via groupBy().pivot() (SURVEY.md §2 D —
    # per-host fetch-status dashboards).  The pivot VALUES are given
    # explicitly: without them Spark runs an extra distinct-collect job to
    # discover them (a driver round-trip a 100-TB scan cannot afford) and
    # the output schema becomes data-dependent.  With explicit values the
    # pivot plans as a two-level hash aggregation — partial-combined
    # groupBy (cohort, event_type), then the pivot aggregate by cohort —
    # so the second exchange carries only |cohorts| x |values| pre-
    # aggregated rows, negligible at any input scale (plan-asserted).
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy((F.col("user_id") % 8).cast("int").alias("cohort"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.round(F.sum("value"), 4))
    )


# --------------------------------------------------------------------- G


@op(
    "politeness_topk",
    "SELECT l_orderkey, l_linenumber, rn FROM (SELECT l_orderkey, l_linenumber, "
    "row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, "
    "l_linenumber ASC) AS rn FROM lineitem) WHERE rn <= 2",
    "G",
)
def politeness_topk(spark, sf):
    # the politeness window's exact shape: per-group top-B under a TOTAL
    # order (engine/politeness.py)
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber").asc()
    )
    return (
        load_table(spark, sf, "lineitem")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("l_orderkey", "l_linenumber", "rn")
    )


@op(
    "rank_audit",
    "SELECT l_orderkey, l_linenumber, "
    "rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rnk, "
    "dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS drnk "
    "FROM lineitem",
    "G",
)
def rank_audit(spark, sf):
    w = Window.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@op(
    "lag_interval",
    "SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) - "
    "CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) "
    "AS gap_s FROM events",
    "G",
)
def lag_interval(spark, sf):
    # per-host inter-request spacing vs crawl_delay (SURVEY.md §2 G3)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf, "events")
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias(
            "gap_s"
        ),
    )


@op(
    "rolling_rate",
    "SELECT event_id, round(sum(value) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) "
    "AS roll_val FROM events",
    "G",
)
def rolling_rate(spark, sf):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    ev = load_table(spark, sf, "events")
    return ev.select(
        "event_id", F.round(F.sum("value").over(w), 4).alias("roll_val")
    )


@op(
    "ntile_shard_audit",
    "SELECT tile, count(*) AS cnt FROM (SELECT ntile(8) OVER "
    "(ORDER BY l_orderkey, l_linenumber) AS tile FROM lineitem) GROUP BY tile",
    "G",
)
def ntile_shard_audit(spark, sf):
    w = Window.orderBy("l_orderkey", "l_linenumber")
    return (
        load_table(spark, sf, "lineitem")
        .select(F.ntile(8).over(w).alias("tile"))
        .groupBy("tile")
        .agg(F.count("*").alias("cnt"))
    )


# --------------------------------------------------------------------- H


@op(
    "order_fetch_log",
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity < 3 "
    "ORDER BY l_orderkey, l_linenumber",
    "H",
)
def order_fetch_log(spark, sf):
    return (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_quantity") < 3)
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


@op(
    "global_topk",
    "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem "
    "ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 100",
    "H",
)
def global_topk(spark, sf):
    # TakeOrderedAndProject under a total order (unique tie-break keys)
    return (
        load_table(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
    )


@op(
    "union_new_links",
    "SELECT l_orderkey, l_linenumber, count(*) AS dup_cnt, "
    "round(max(l_quantity), 4) AS max_qty FROM ("
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < 25 "
    "UNION ALL "
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 20"
    ") GROUP BY l_orderkey, l_linenumber",
    "H",
)
def union_new_links(spark, sf):
    # the frontier-merge shape (op H3): union + lattice aggregate, never
    # dropDuplicates (engine/frontier.merge_frontier)
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    u = li.filter(F.col("l_quantity") < 25).unionByName(
        li.filter(F.col("l_quantity") > 20)
    )
    return u.groupBy("l_orderkey", "l_linenumber").agg(
        F.count("*").alias("dup_cnt"),
        F.round(F.max("l_quantity"), 4).alias("max_qty"),
    )


@op(
    "except_selected",
    "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O' "
    "EXCEPT ALL SELECT o_orderkey FROM orders WHERE o_totalprice > 150000",
    "H",
)
def except_selected(spark, sf):
    orders = load_table(spark, sf, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    b = orders.filter(F.col("o_totalprice") > 150000).select("o_orderkey")
    return a.exceptAll(b)


@op(
    "intersect_invariant",
    "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O' "
    "INTERSECT SELECT o_orderkey FROM orders WHERE o_totalprice > 150000",
    "H",
)
def intersect_invariant(spark, sf):
    orders = load_table(spark, sf, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    b = orders.filter(F.col("o_totalprice") > 150000).select("o_orderkey")
    return a.intersect(b)


@op(
    "agg_sort_fallback",
    "SELECT l_orderkey, l_linenumber, COUNT(*) AS n, "
    "ROUND(SUM(l_extendedprice), 4) AS sum_price FROM lineitem "
    "GROUP BY l_orderkey, l_linenumber",
    "D",
)
def agg_sort_fallback(spark, sf):
    # near-unique grouping keys: the hash aggregate's worst case — at
    # 10^10 this is the path that must spill gracefully (SURVEY.md §2 D
    # agg_sort_fallback; §4 'spill-to-disk' row).  Catalyst still does
    # partial→final; the test is that semantics hold at high cardinality.
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_orderkey", "l_linenumber").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
    )


@op(
    "cube_metrics",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
    "ROUND(SUM(l_quantity), 4) AS sum_qty FROM lineitem "
    "GROUP BY CUBE (l_returnflag, l_linestatus)",
    "D",
)
def cube_metrics(spark, sf):
    # all 2^k grains in one pass (SURVEY.md §2 D rollup/cube family)
    li = load_table(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


@op(
    "grouping_sets_metrics",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem "
    "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))",
    "D",
)
def grouping_sets_metrics(spark, sf):
    li = load_table(spark, sf, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM _gs_lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"
    )
