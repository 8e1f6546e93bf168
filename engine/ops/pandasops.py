"""Pandas-surface operators (SURVEY.md §2 group I): cogrouped-map as-of
join and a grouped-agg UDAF — the two Arrow surfaces the crawl pipeline
itself doesn't exercise (its UDFs are scalar/iterator/grouped-map).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from engine.io import load_table
from engine.ops import op


@op(
    "asof_join_cogroup",
    # DuckDB has native ASOF JOIN: for every purchase, the most recent
    # click by the same user at-or-before the purchase ts
    "SELECT p.event_id AS purchase_id, "
    "CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS purchase_ts, p.user_id, "
    "CAST(FLOOR(epoch(c.ts)) AS BIGINT) AS click_ts "
    "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
    "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c "
    "ON p.user_id = c.user_id AND p.ts >= c.ts",
    "I",
)
def asof_join_cogroup(spark, sf):
    """As-of join via cogrouped applyInPandas + pd.merge_asof (SURVEY.md
    §2 C5 alt / group I cogrouped-map).  Scale shape: both sides shuffle
    once on the equi-key (user_id ≙ url_hash), each cogroup sorts only
    its own partition — no global sort, no window over the full table."""
    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "ts", "user_id"
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values("ts")
        # the on-key itself doesn't survive from the right side, so carry
        # the click ts as an explicit payload column
        right = right.sort_values("ts").assign(ts_c=lambda d: d["ts"])
        if len(right):
            m = pd.merge_asof(
                left, right, on="ts", by="user_id",
                direction="backward", allow_exact_matches=True,
            )
        else:
            m = left.assign(ts_c=pd.NaT)
        # epoch seconds for matched clicks only: never astype("int64") a
        # datetime column that may hold NaT (pandas deprecated the
        # NaT→sentinel conversion; it is slated to raise)
        click_ts = pd.Series(pd.NA, index=m.index, dtype="Int64")
        matched = m["ts_c"].notna()
        if matched.any():
            click_ts[matched] = (
                m.loc[matched, "ts_c"].astype("int64") // 10**9
            )
        out = pd.DataFrame(
            {
                "purchase_id": m["event_id"],
                "purchase_ts": (
                    m["ts"].astype("int64") // 10**9
                ),
                "user_id": m["user_id"],
                "click_ts": click_ts,
            }
        )
        return out

    # pd.merge_asof(by=) joins within user; cogroup on user_id keeps each
    # group in one task.  Empty right cogroups handled explicitly above.
    def cog(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return merge(left, right)

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            cog,
            "purchase_id bigint, purchase_ts bigint, user_id bigint, "
            "click_ts bigint",
        )
    )


@op(
    "host_bytes_p90",
    "SELECT source, ROUND(quantile_cont(n_chars, 0.9), 4) AS p90_chars "
    "FROM documents GROUP BY source",
    "I",
)
def host_bytes_p90(spark, sf):
    """Grouped-agg pandas UDAF (SURVEY.md §2 I): per-host p90 of document
    size — numpy linear interpolation ≡ SQL quantile_cont."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def p90(v: pd.Series) -> float:
        return float(np.percentile(v.astype("float64"), 90))

    docs = load_table(spark, sf, "documents")
    return docs.groupBy("source").agg(
        F.round(p90("n_chars"), 4).alias("p90_chars")
    )
