"""Round-3 corpus-shaping ops (engine/ops/textops.py: domain_cap_sample,
c4_quality_filter, exact_substring_contain) verified against in-process
brute force over sf0.001, plus plan-shape pins and an adversarial
short-doc corpus that drives exact_substring_contain's broadcast
fallback path (untaken on driver data — every sf doc has ≥10 tokens).
"""

from __future__ import annotations

import hashlib
import re

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    from engine.ops import REGISTRY, _load_all

    _load_all()
    return REGISTRY


@pytest.fixture(scope="module")
def docs(spark):
    from engine.io import load_table

    return [
        (r["doc_id"], r["text"], r["lang"], r["source"])
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "text", "lang", "source")
        .collect()
    ]


def test_domain_cap_sample_matches_brute_force(spark, registry, docs):
    got = {
        (r["doc_id"], r["source"])
        for r in registry["domain_cap_sample"].fn(spark, SF).collect()
    }
    by_source: dict[str, list[tuple[str, int]]] = {}
    for doc_id, text, _lang, source in docs:
        key = hashlib.sha256((text or "").encode()).hexdigest()
        by_source.setdefault(source, []).append((key, doc_id))
    want = set()
    for source, rows in by_source.items():
        for _key, doc_id in sorted(rows)[:10]:
            want.add((doc_id, source))
    assert got == want
    # the cap actually binds somewhere (otherwise the test proves nothing)
    assert any(len(rows) > 10 for rows in by_source.values())


def test_domain_cap_sample_uses_window_group_limit(spark, registry):
    plan = registry["domain_cap_sample"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def _c4_brute(doc_id, text, lang):
    toks = re.split(r"\s+", (text or "").strip())
    n_words = len(toks)
    n_nospace = len((text or "").replace(" ", ""))
    mwl_cp = (n_nospace * 100) // n_words
    max_wlen = max(len(t) for t in toks)
    from engine.textanalysis import LANG_MARKERS

    n_stop = sum(1 for t in toks if t in LANG_MARKERS["en"])
    keep = int(
        20 <= n_words <= 100000
        and 300 <= mwl_cp <= 1000
        and max_wlen <= 30
        and (lang != "en" or n_stop * 100 >= n_words)
    )
    return (doc_id, n_words, mwl_cp, max_wlen, n_stop, keep)


def test_c4_quality_filter_matches_brute_force(spark, registry, docs):
    got = {
        tuple(r)
        for r in registry["c4_quality_filter"].fn(spark, SF).collect()
    }
    want = {_c4_brute(d, t, lang) for d, t, lang, _s in docs}
    assert got == want
    keeps = {k for *_x, k in got}
    assert keeps == {0, 1}, "gate must both keep and drop on this corpus"


def test_c4_quality_filter_is_shuffle_free_jvm_only(spark, registry):
    plan = registry["c4_quality_filter"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def _contain_brute(rows):
    norm = {
        d: " ".join(re.split(r"\s+", (t or "").strip())) for d, t in rows
    }
    out = {}
    for a, na in norm.items():
        containers = [
            b
            for b, nb in norm.items()
            if b != a
            and f" {na} " in f" {nb} "
            and (len(nb) > len(na) or (nb == na and b < a))
        ]
        if containers:
            out[a] = (len(containers), min(containers))
    return out


def test_exact_substring_contain_matches_brute_force(spark, registry, docs):
    got = {
        r["doc_id"]: (r["n_containers"], r["min_container"])
        for r in registry["exact_substring_contain"].fn(spark, SF).collect()
    }
    want = _contain_brute([(d, t) for d, t, _l, _s in rows] if (rows := docs) else [])
    assert got == want
    assert want, "corpus must contain at least one contained doc"


def test_exact_substring_contain_no_nested_loop_on_driver_data(spark, registry):
    plan = registry["exact_substring_contain"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def _span_brute(rows, w=10):
    seen = set()
    out = {}
    for doc_id, text in sorted(rows):
        toks = re.split(r"\s+", (text or "").strip())
        kept, dropped = [], 0
        for i in range(0, (len(toks) + w - 1) // w):
            chunk = " ".join(toks[i * w : i * w + w])
            if chunk in seen:
                dropped += 1
            else:
                seen.add(chunk)
                kept.append(chunk)
        out[doc_id] = (" ".join(kept), dropped)
    return out


def test_span_dedup_matches_brute_force(spark, registry, docs):
    got = {
        r["doc_id"]: (r["kept_text"], r["n_dropped"])
        for r in registry["span_dedup"].fn(spark, SF).collect()
    }
    want = _span_brute([(d, t) for d, t, _l, _s in docs])
    assert got == want
    # the dedup actually binds (duplicate docs exist in every sf corpus)
    assert any(n for _t, n in want.values())


def test_span_dedup_stays_jvm_side(spark, registry):
    plan = registry["span_dedup"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def _unigram_brute(rows):
    import collections

    cnt = collections.Counter()
    for _d, text in rows:
        cnt.update(re.split(r"\s+", (text or "").strip()))
    total = sum(cnt.values())
    out = {}
    for doc_id, text in rows:
        toks = re.split(r"\s+", (text or "").strip())
        s = sum((cnt[t] * 1_000_000) // total for t in toks)
        out[doc_id] = (len(toks), s // len(toks))
    return out


def test_unigram_freq_score_matches_brute_force(spark, registry, docs):
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_tf_ppm"])
        for r in registry["unigram_freq_score"].fn(spark, SF).collect()
    }
    want = _unigram_brute([(d, t) for d, t, _l, _s in docs])
    assert got == want
    # scores carry signal: not all docs share one value, all within bounds
    scores = {v for _n, v in want.values()}
    assert len(scores) > 1
    assert all(0 <= v <= 1_000_000 for v in scores)


def test_unigram_freq_score_stays_jvm_side(spark, registry):
    plan = registry["unigram_freq_score"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_exact_substring_contain_short_doc_fallback(spark, registry, tmp_path):
    # corpus with <K-token docs: 'a b' is contained in 'a b c' and in the
    # long doc; 'q' is nowhere; equal short texts tie-break by doc_id
    rows = [
        (0, "a b", "en", "s0"),
        (1, "a b c", "en", "s0"),
        (2, "x " * 3 + "a b c d e f g h", "en", "s1"),
        (3, "q", "en", "s1"),
        (4, "a b", "en", "s2"),
    ]
    df = spark.createDataFrame(
        [(d, t.strip(), lang, s, len(t)) for d, t, lang, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    df_op = registry["exact_substring_contain"].fn(spark, str(tmp_path))
    got = {
        r["doc_id"]: (r["n_containers"], r["min_container"])
        for r in df_op.collect()
    }
    want = _contain_brute([(d, t.strip()) for d, t, _l, _s in rows])
    assert got == want
    assert 0 in want and 4 in want and 3 not in want
    # VERDICT r3 #4: with short docs PRESENT the plan must still be
    # nested-loop-free — shorts verify through the same gram equi-join
    plan = df_op._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_exact_substring_contain_empty_docs(spark, registry, tmp_path):
    # empty docs pair only with other empty docs (min doc_id wins); the
    # plan stays nested-loop-free
    rows = [
        (0, "", "en", "s0"),
        (1, "", "en", "s0"),
        (2, "a b c d e f", "en", "s1"),
        (3, "   ", "en", "s1"),  # whitespace-only normalizes to empty
    ]
    df = spark.createDataFrame(
        [(d, t, lang, s, len(t)) for d, t, lang, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    df_op = registry["exact_substring_contain"].fn(spark, str(tmp_path))
    got = {
        r["doc_id"]: (r["n_containers"], r["min_container"])
        for r in df_op.collect()
    }
    want = _contain_brute([(d, t) for d, t, _l, _s in rows])
    assert got == want
    assert 1 in got and 3 in got and 2 not in got
    plan = df_op._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def _host_rollup_brute(rows):
    import collections

    kc = collections.Counter(
        hashlib.sha256((t or "").encode()).hexdigest() for _d, t, _s in rows
    )
    per = collections.defaultdict(list)
    for _d, text, source in rows:
        k = hashlib.sha256((text or "").encode()).hexdigest()
        n_words = len(re.split(r"\s+", (text or "").strip()))
        per[source].append((kc[k] > 1, n_words))
    out = {}
    for source, sig in per.items():
        n = len(sig)
        dups = sum(1 for d, _w in sig if d)
        mw = sum(w for _d, w in sig) // n
        out[source] = (n, dups, mw, int(dups * 2 < n and mw >= 10))
    return out


def test_host_quality_rollup_matches_brute_force(spark, registry, docs):
    got = {
        r["source"]: (r["n_docs"], r["dup_docs"], r["mean_words"], r["keep"])
        for r in registry["host_quality_rollup"].fn(spark, SF).collect()
    }
    want = _host_rollup_brute([(d, t, s) for d, t, _l, s in docs])
    assert got == want


def test_host_quality_rollup_verdict_branches(spark, registry, tmp_path):
    # synthetic corpus where both drop reasons bind: s0 is majority-
    # duplicate (3 of 4 docs share one text), s1 is degenerate-short,
    # s2 is clean; cross-source duplicates count against BOTH sources
    long = "w " * 19 + "w"
    rows = [
        (0, long, "s0"),
        (1, long, "s0"),
        (2, long, "s0"),
        (3, "unique text here with plenty of words to stay wordy", "s0"),
        (4, "tiny", "s1"),
        (5, "also tiny", "s1"),
        (6, "a perfectly ordinary document with more than ten words in it", "s2"),
        (7, long, "s2"),
        (8, "another clean and sufficiently long document keeps this source alive today", "s2"),
    ]
    df = spark.createDataFrame(
        [(d, t, "en", s, len(t)) for d, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["source"]: (r["n_docs"], r["dup_docs"], r["mean_words"], r["keep"])
        for r in registry["host_quality_rollup"].fn(spark, str(tmp_path)).collect()
    }
    assert got == _host_rollup_brute([(d, t, s) for d, t, s in rows])
    assert got["s0"][3] == 0  # majority duplicate → drop
    assert got["s1"][3] == 0  # degenerate length → drop
    assert got["s2"][3] == 1  # one dup of 3 is not a majority → keep


def test_host_quality_rollup_stays_jvm_side(spark, registry):
    plan = registry["host_quality_rollup"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def _shard_brute(rows, budget=4096):
    out = {}
    prefix = 0
    for doc_id, text in sorted(rows):
        n = len(re.split(r"\s+", (text or "").strip()))
        out[doc_id] = (n, prefix // budget)
        prefix += n
    return out


def test_token_shard_plan_matches_brute_force(spark, registry, docs):
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard"])
        for r in registry["token_shard_plan"].fn(spark, SF).collect()
    }
    want = _shard_brute([(d, t) for d, t, _l, _s in docs])
    assert got == want
    # multiple shards exist and every shard except the last is "full
    # enough" (a doc never splits, so shards overshoot by < one doc)
    shards = sorted({s for _n, s in want.values()})
    assert shards == list(range(len(shards))) and len(shards) > 1


def test_token_shard_plan_identical_across_parallelism(spark, registry):
    # the two-level prefix sum must be a pure function of the corpus:
    # same result at any shuffle-partition count
    df = registry["token_shard_plan"].fn(spark, SF)
    base = sorted(map(tuple, df.collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = sorted(
            map(tuple, registry["token_shard_plan"].fn(spark, SF).collect())
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == again


def test_token_shard_plan_no_global_window_over_corpus(spark, registry):
    # the only ORDER-BY-without-PARTITION-BY window may run over the
    # block table (corpus/B rows), never the doc stream: assert the
    # single-partition exchange feeds a plan whose row source is the
    # block aggregate, by checking the full-corpus window is partitioned
    plan = registry["token_shard_plan"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    import re as _re

    # every Window over doc-level columns must carry a partition spec;
    # materialize the matches first so a plan-rendering change that stops
    # the pattern matching FAILS loudly instead of passing vacuously
    # (ADVICE r3)
    matches = list(_re.finditer(r"Window \[sum\(n_tokens#?\w*", plan))
    assert len(matches) >= 1, plan
    for m in matches:
        seg = plan[m.start() : m.start() + 300]
        assert "blk" in seg, seg
