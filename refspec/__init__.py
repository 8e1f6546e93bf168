"""refspec — the executable specification of the crawl semantics.

A pure-Python, single-process, dependency-free crawler (~200 LoC) that IS
the reference the Spark engine must match (SURVEY.md §0.2): same fetch
sequence (round, url), same final URL-seen set, byte-identical extracted
text per url.  It shares the pure primitives in engine/pure.py with the
engine, and implements the pinned round semantics of SURVEY.md §3.2 with
plain loops and dicts — no Spark, deliberately boring.
"""

from refspec.crawler import CrawlConfig, RefCrawlResult, run_crawl

__all__ = ["CrawlConfig", "RefCrawlResult", "run_crawl"]
