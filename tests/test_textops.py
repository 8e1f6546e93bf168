"""Dedup-suite verification the DuckDB oracle can't express (SURVEY.md §5,
engine/ops/textops.py): MinHash-LSH and SimHash are checked against
driver-side brute force over the sf0.001 documents (500 docs → 125k pairs,
cheap in-process).
"""

from __future__ import annotations

import pytest

from engine.textanalysis import jaccard, simhash64

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from engine.io import load_table

    return {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    }


@pytest.fixture(scope="module")
def true_pairs(docs):
    """Brute-force ground truth: all pairs with n-gram jaccard >= 0.5."""
    ids = sorted(docs)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = jaccard(docs[a] or "", docs[b] or "")
            if j >= 0.5:
                out[(a, b)] = round(j, 4)
    return out


def test_minhash_lsh_sound_and_high_recall(spark, docs, true_pairs):
    from engine.ops import REGISTRY, _load_all

    _load_all()
    got = {
        (r["doc_a"], r["doc_b"]): r["jac"]
        for r in REGISTRY["dedup_minhash_lsh"].fn(spark, SF).collect()
    }
    # soundness: every reported pair is a true >= 0.5 pair with the exact
    # jaccard value (the op verifies candidates with the exact measure)
    for pair, j in got.items():
        assert pair in true_pairs and true_pairs[pair] == j
    # recall: LSH banding may miss borderline pairs, never the near-exact
    # ones.  Everything at jaccard >= 0.8 must be found.
    strong = {p for p, j in true_pairs.items() if j >= 0.8}
    assert strong <= set(got)
    if true_pairs:
        recall = len(got) / len(true_pairs)
        assert recall >= 0.5, (recall, len(true_pairs))


def test_ngram_jaccard_values_exact(spark, docs):
    from engine.ops import REGISTRY, _load_all

    _load_all()
    rows = REGISTRY["dedup_ngram_jaccard"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        exp = round(jaccard(docs[r["doc_a"]] or "", docs[r["doc_b"]] or ""), 4)
        assert r["jac"] == exp


def test_simhash_complete_and_sound_for_hamming_le3(spark, docs):
    from engine.ops import REGISTRY, _load_all

    _load_all()
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in REGISTRY["dedup_simhash"].fn(spark, SF).collect()
    }
    fps = {d: simhash64(t or "") for d, t in docs.items()}
    ids = sorted(fps)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((fps[a] ^ fps[b]) & (2**64 - 1)).count("1")
            if h <= 3:
                expected[(a, b)] = h
    # pigeonhole banding guarantees EXACT completeness at hamming <= 3,
    # and the final filter guarantees soundness — so equality, not recall
    assert got == expected
