"""Scalar-function suites (SURVEY.md §2 group F): string / hash / date /
math / array / json — all JVM-side builtins (whole-stage codegen), no
Python in any of these paths.  The crawl-specific F1/F3/F4 UDFs live in
engine/ops/crawlops.py (not SQL-expressible → refspec-checked)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.io import load_table
from engine.ops import op


@op(
    "url_hash64",
    "SELECT doc_id, substr(sha256(text), 1, 16) AS h16 FROM documents",
    "F",
)
def url_hash64(spark, sf):
    # SQL-oracle-able twin of engine.pure.hash64: same 8 leading sha256
    # bytes, hex-encoded (Spark sha2 ≡ DuckDB sha256, both lowercase hex)
    return load_table(spark, sf, "documents").select(
        "doc_id", F.substring(F.sha2("text", 256), 1, 16).alias("h16")
    )


@op(
    "str_suite",
    "SELECT doc_id, upper(substr(text, 1, 12)) AS head12, length(text) AS n_len, "
    "concat_ws('|', lang, source) AS tag, "
    "CAST(strpos(text, 'data') AS INT) AS pos_data FROM documents",
    "F",
)
def str_suite(spark, sf):
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("head12"),
        F.length("text").alias("n_len"),
        F.concat_ws("|", "lang", "source").alias("tag"),
        F.instr(F.col("text"), "data").cast("int").alias("pos_data"),
    )


@op(
    "date_suite",
    "SELECT event_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, "
    "CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m, "
    "CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-12-31') AS INT) AS days_left "
    "FROM events",
    "F",
)
def date_suite(spark, sf):
    ev = load_table(spark, sf, "events")
    return ev.select(
        "event_id",
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.datediff(F.lit("2024-12-31").cast("date"), F.col("ts").cast("date"))
        .cast("int")
        .alias("days_left"),
    )


@op(
    "math_suite",
    "SELECT l_orderkey, l_linenumber, l_orderkey % 8 AS shard, "
    "round(l_quantity * l_extendedprice, 4) AS gross, "
    "round(abs(l_discount - 0.05), 4) AS d_abs, "
    "round(ln(1 + l_tax), 4) AS tax_l1p, "
    "CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k "
    "FROM lineitem",
    "F",
)
def math_suite(spark, sf):
    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.pmod("l_orderkey", F.lit(8)).alias("shard"),  # keys > 0: ≡ '%'
        F.round(F.col("l_quantity") * F.col("l_extendedprice"), 4).alias("gross"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("d_abs"),
        F.round(F.log1p("l_tax"), 4).alias("tax_l1p"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_k"),
    )


@op(
    "array_suite",
    "SELECT vec_id, len(embedding) AS dim, "
    "round(CAST(embedding[1] AS DOUBLE), 4) AS first_val, "
    "round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val "
    "FROM embeddings",
    "F",
)
def array_suite(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_val"),
    )


@op(
    "json_map_suite",
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val "
    "FROM events",
    "F",
)
def json_map_suite(spark, sf):
    # get_json_object path; the from_json→MapType path is pytest-checked
    # (tests/test_operators.py) since DuckDB has no MapType to compare
    ev = load_table(spark, sf, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


@op(
    "explode_links",
    "SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents "
    "WHERE doc_id < 100",
    "F",
)
def explode_links_op(spark, sf):
    # one row per (src, dst) edge — the frontier-growth shape (SURVEY.md
    # §2 F explode_links); tokens stand in for hrefs on the oracle corpus
    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
