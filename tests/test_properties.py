"""Property-based tests (SURVEY.md §5.3) over the pure kernel shared by
the Spark engine and the refspec oracle: URL canonicalization grammar +
idempotence, the pinned cross-language hash, extractor invariants, and
the politeness/merge determinism properties on Spark itself.
"""

from __future__ import annotations

import string

import pytest
from hypothesis import given, settings, strategies as st

from engine.pure import canon, extract_links, hash64, html_to_text

# --- url strategy: structured junk that looks like hrefs -----------------

_host_chars = st.text(
    alphabet=string.ascii_letters + string.digits + ".-", min_size=1, max_size=20
)
_path_chars = st.text(
    alphabet=string.ascii_letters + string.digits + "/._~%-!$&'()*+,;=:@", max_size=30
)
_query_chars = st.text(
    alphabet=string.ascii_letters + string.digits + "&=%_-", max_size=20
)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HtTpS"]))
    host = draw(_host_chars)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_path_chars)
    query = draw(st.sampled_from(["", "?"]) ) + draw(_query_chars)
    frag = draw(st.sampled_from(["", "#x", "#frag"]))
    return f"{scheme}://{host}{port}/{path}{query}{frag}"


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canon_idempotent(u):
    c = canon(u)
    if c is not None:
        assert canon(c) == c


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canon_output_grammar(u):
    c = canon(u)
    if c is None:
        return
    scheme, sep, rest = c.partition("://")
    assert sep and scheme in ("http", "https")
    hostport = rest.split("/", 1)[0]
    host = hostport.rsplit(":", 1)[0] if ":" in hostport else hostport
    assert host == host.lower()
    # default port for the SCHEME is stripped; non-default ports survive
    default = ":80" if scheme == "http" else ":443"
    assert not hostport.endswith(default)
    assert "#" not in c
    assert "/" in rest  # path is at least '/'


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_hash64_int64_and_deterministic(s):
    h = hash64(s)
    assert -(2**63) <= h < 2**63
    assert hash64(s) == h


@given(st.binary(max_size=400))
@settings(max_examples=200, deadline=None)
def test_html_to_text_total_and_normalized(b):
    t = html_to_text(b)
    assert t is not None
    assert "  " not in t
    assert t == t.strip()


@given(st.binary(max_size=400))
@settings(max_examples=100, deadline=None)
def test_extract_links_canonical_sorted_deduped(b):
    links = extract_links(b, "http://base.example.test/a/b")
    assert links is not None
    assert links == sorted(set(links))
    for u in links:
        assert canon(u) == u


@given(st.binary(max_size=400))
@settings(max_examples=150, deadline=None)
def test_combined_extractor_equals_two_pass(b):
    # the crawl hot path parses once (extract_text_and_links); its output
    # must be byte-identical to the pinned F3/F4 two-pass dialect
    from engine.pure import extract_text_and_links

    base = "http://base.example.test/a/b"
    t, ls = extract_text_and_links(b, base)
    assert t == html_to_text(b)
    assert ls == extract_links(b, base)


def test_combined_extractor_equals_two_pass_on_corpus():
    # every real fixture page, not just fuzz: the corpus html exercises
    # nested blocks, script/style skips, versioned re-renders
    from engine.pure import extract_text_and_links
    from fixtures.gen import gen_corpus

    c = gen_corpus("XS")
    assert len(c.pages) > 0
    for p in c.pages:
        t, ls = extract_text_and_links(p["html"], p["url"])
        assert t == html_to_text(p["html"])
        assert ls == extract_links(p["html"], p["url"])


# --- Spark-side determinism properties (small, fixed cases) --------------


def _mk_candidates(spark, rows):
    return spark.createDataFrame(
        rows,
        "url_hash long, url string, host string, priority int, depth int, "
        "discovered_round int, src_url string",
    )


CASES = [
    # hot host with ties on priority (url breaks them), cold hosts
    [
        (i, f"http://h0.example.test/p/{i}", "h0.example.test", p, 0, r, "")
        for i, (p, r) in enumerate(
            [(5, 0), (5, 1), (5, 0), (3, 0), (3, 2), (9, 1), (9, 0), (1, 0)]
        )
    ]
    + [
        (100 + i, f"http://h{i}.example.test/p/0", f"h{i}.example.test", 2, 0, 0, "")
        for i in range(1, 4)
    ],
]


@pytest.mark.parametrize("rows", CASES)
def test_two_phase_politeness_equals_single_phase(spark, rows):
    from engine.politeness import select_top_b

    df = _mk_candidates(spark, rows)
    one = sorted(map(tuple, select_top_b(df, 2, {}, salt=1).collect()))
    for salt in (2, 8):
        multi = sorted(map(tuple, select_top_b(df, 2, {}, salt=salt).collect()))
        assert multi == one, f"salt={salt}"


@pytest.mark.parametrize("rows", CASES)
def test_merge_frontier_order_insensitive(spark, rows):
    from engine.frontier import merge_frontier

    # duplicate url_hash entries with different priorities/rounds
    dups = rows + [
        (r[0], r[1], r[2], r[3] + 1, r[4] + 1, r[5] + 2, "http://z.example.test/")
        for r in rows[::2]
    ]
    df = _mk_candidates(spark, dups)
    merged = sorted(map(tuple, merge_frontier(df).collect()))
    rev = _mk_candidates(spark, list(reversed(dups)))
    merged_rev = sorted(map(tuple, merge_frontier(rev).collect()))
    assert merged == merged_rev
    # lattice: per url_hash exactly one row, min round / max priority kept
    by_hash = {}
    for r in dups:
        h = r[0]
        cur = by_hash.get(h)
        if cur is None:
            by_hash[h] = list(r)
        else:
            cur[3] = max(cur[3], r[3])
            cur[4] = min(cur[4], r[4])
            cur[5] = min(cur[5], r[5])
    assert len(merged) == len(by_hash)


def test_vectorized_canon_hash_equals_scalar(spark):
    """The Arrow UDF path must produce bit-identical canon+hash to the
    scalar pure functions (SURVEY.md §7.3 risk 1)."""
    from pyspark.sql import functions as F

    from engine.pure import canon as canon_scalar, hash64
    from engine.udfs import canon_hash_udf

    raws = [
        "HTTP://H0.Example.TEST:80/a/../p/1?b=2&a=1&a=#frag",
        "https://site.example.test:443/%7Euser/%2e%2e/x",
        "http://h1.example.test/p/3",
        "notaurl",
        "ftp://nope.example.test/x",
    ]
    df = spark.createDataFrame([(u,) for u in raws], "url string")
    got = {
        r["url"]: (r["c"]["url"], r["c"]["url_hash"])
        for r in df.select("url", canon_hash_udf(F.col("url")).alias("c")).collect()
    }
    for u in raws:
        c = canon_scalar(u)
        exp = (c, hash64(c) if c is not None else None)
        assert got[u] == exp, u
