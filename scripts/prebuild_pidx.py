"""Pre-materialize a scaling corpus's pages index (corpus-invariant,
unmeasured warm-up state) with an UNPINNED wide session, so the pinned
scaling workers — especially the narrow level, which otherwise builds it
solo at N cores — only pay the cheap parquet reload.  Identical output
contract to the inline build in scripts/bench_scaling.py run_worker:
parquet files + _DONE marker at <corpus>_pidxz.

Usage: python scripts/prebuild_pidx.py <corpus_dir> [cpus]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    corpus = sys.argv[1]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    idx_cache = corpus.rstrip("/") + "_pidxz"
    marker = os.path.join(idx_cache, "_DONE")
    if os.path.exists(marker):
        print(f"pidx already built: {idx_cache}")
        return 0

    from engine.crawl import pages_index
    from engine.io import load_corpus
    from engine.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="prebuild-pidx",
        shuffle_partitions=cpus * 3,
        extra={"spark.ui.enabled": "false", "spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = load_corpus(spark, corpus)["pages"]
    pages_index(pages.select("url", "warc_ts", "html")).write.mode(
        "overwrite"
    ).parquet(idx_cache)
    with open(marker, "w") as fh:
        fh.write("ok")
    print(f"pidx built: {idx_cache}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
