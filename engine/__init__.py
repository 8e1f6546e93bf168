"""engine — PySpark-native URL-frontier + fetch scheduler (SURVEY.md).

A brand-new DataFrame-first implementation of the reference's crawl
capabilities (BASELINE.json north_star): bloom/cuckoo URL-seen set,
per-host politeness-budgeted priority selection, robots gating, Arrow-UDF
canonicalization/extraction, snapshot checkpointing with resume — designed
for a 10^10-URL frontier on a multi-executor cluster, tested on local[*].
"""
