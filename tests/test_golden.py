"""Golden-fixture anchor (SURVEY.md §5.4): the S-corpus crawl result is
checked in (tests/golden/s_corpus.json, generated from refspec).  This
guards the SPEC itself — if fixtures/gen.py or the pinned crawl semantics
drift, refspec stops matching the golden file and this fails in
milliseconds, before any Spark test runs.  The engine is anchored
transitively through tests/test_crawl_vs_refspec.py (engine ≡ refspec).
Pure Python — no Spark session needed.
"""

from __future__ import annotations

import hashlib
import json
import os

from fixtures.gen import gen_corpus
from refspec import CrawlConfig, run_crawl

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "s_corpus.json")


def _refspec_result():
    corpus = gen_corpus("S")
    cfg = CrawlConfig(
        seeds=tuple(corpus.seeds),
        default_budget=corpus.default_budget,
        budget_overrides=corpus.budget_overrides,
        max_rounds=100,
    )
    return run_crawl(corpus.pages, corpus.robots, cfg)


def test_refspec_matches_checked_in_golden():
    with open(GOLDEN) as f:
        golden = json.load(f)
    res = _refspec_result()
    assert [list(t) for t in res.fetch_log()] == golden["fetch_log"]
    assert sorted([[h, u] for h, u in res.seen.items()]) == golden["seen"]
    digests = {
        u: hashlib.sha256(t.encode("utf-8")).hexdigest()
        for u, t in res.texts.items()
    }
    assert digests == golden["text_sha256"]
