"""Shared pytest fixtures: one SparkSession per test session, the S-size
synthetic corpus (parquet + in-memory), and the refspec oracle result."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from engine.session import get_spark  # noqa: E402
from fixtures.gen import Corpus, gen_corpus, write_parquet  # noqa: E402
from refspec import CrawlConfig, run_crawl as ref_run_crawl  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master="local[8]",
        app_name="engine-tests",
        shuffle_partitions=8,
        extra={"spark.driver.memory": "8g", "spark.ui.enabled": "false"},
    )
    yield s


@pytest.fixture(scope="session")
def corpus() -> Corpus:
    return gen_corpus("S")


@pytest.fixture(scope="session")
def corpus_dir(corpus, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("corpus_s")
    write_parquet(corpus, str(d))
    return str(d)


@pytest.fixture(scope="session")
def ref_result(corpus):
    cfg = CrawlConfig(
        seeds=tuple(corpus.seeds),
        default_budget=corpus.default_budget,
        budget_overrides=corpus.budget_overrides,
        max_rounds=100,
    )
    return ref_run_crawl(corpus.pages, corpus.robots, cfg)
