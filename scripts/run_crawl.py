"""spark-submit entry point for the crawl engine (BASELINE.json:14).

Usage (cluster):
    zip -r engine.zip engine/
    spark-submit --py-files engine.zip scripts/run_crawl.py \
        --corpus <dir with pages/seeds/robots parquet> \
        --store  <snapshot-store dir> [--max-rounds N] [--budget B] \
        [--salt S] [--budget-override host=N ...]

Local smoke:
    spark-submit --master 'local[8]' --py-files engine.zip \
        scripts/run_crawl.py --corpus /tmp/corpus --store /tmp/store

Re-running against an existing store RESUMES from the latest committed
snapshot (SURVEY.md §3.4) — a completed crawl is a no-op (0 rounds).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# spark-submit puts the script's OWN dir (scripts/) on sys.path, not the repo
# root; make a plain checkout work without --py-files too.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", required=True, help="dir with pages/seeds/robots parquet")
    ap.add_argument("--store", required=True, help="snapshot store directory")
    ap.add_argument("--max-rounds", type=int, default=100)
    ap.add_argument("--budget", type=int, default=2)
    ap.add_argument(
        "--budget-override", action="append", default=[], metavar="HOST=N"
    )
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument("--master", default=None, help="override master (tests only)")
    ap.add_argument(
        "--seen-filter",
        default="auto",
        choices=["auto", "exact", "bloom", "cuckoo"],
        help="seen-set probe strategy: auto (default) runs the exact "
        "anti-join until the seen set crosses the engage threshold, then "
        "switches to the store-backed sharded bloom pass — fetched urls "
        "are identical in every mode (filters prune, never decide)",
    )
    args = ap.parse_args(argv)

    from engine.crawl import EngineConfig, run_crawl
    from engine.io import load_corpus
    from engine.session import get_spark
    from engine.snapstore import SnapStore

    overrides = {}
    for kv in args.budget_override:
        host, _, n = kv.partition("=")
        if not n:
            ap.error(f"--budget-override wants HOST=N, got {kv!r}")
        overrides[host] = int(n)

    spark = get_spark(
        master=args.master,
        app_name="crawl",
        shuffle_partitions=args.shuffle_partitions,
    )
    tables = load_corpus(spark, args.corpus)
    store = SnapStore(args.store)
    cfg = EngineConfig(
        default_budget=args.budget,
        budget_overrides=overrides,
        max_rounds=args.max_rounds,
        salt=args.salt,
    )
    from engine.filters import (
        adaptive_seen_filter_factory,
        bloom_seen_filter_factory,
        cuckoo_seen_filter_factory,
    )

    factory = {
        "auto": adaptive_seen_filter_factory(),
        "exact": None,
        "bloom": bloom_seen_filter_factory(),
        "cuckoo": cuckoo_seen_filter_factory(),
    }[args.seen_filter]
    rounds = run_crawl(
        spark,
        store,
        tables["pages"],
        tables["robots"],
        tables["seeds"],
        cfg,
        seen_filter_factory=factory,
    )
    sid = store.latest()
    lineage = store.read(spark, "lineage", sid)
    summary = {
        "rounds_run": rounds,
        "snapshot": sid,
        "urls_fetched": lineage.count(),
        "seen": store.read(spark, "seen", sid).count(),
        "frontier_remaining": store.read(spark, "frontier", sid).count(),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
