"""Deterministic synthetic-web corpus generator (FIXTURES.md §2, seed=42).

Generates the `pages` table (schema verbatim from BASELINE.json:15:
url string, warc_ts timestamp, html binary, text string, lang string),
the seed list, per-host robots rules, and politeness budgets.  Everything
is a pure function of url via :func:`engine.pure.stable_hash` — no RNG
state, no wall clock — so the Spark engine, the refspec oracle, and the
golden fixtures all see the identical world.

Host sizes are zipfian(s=1.2): host 0 is hot (exercises the salted
politeness window, SURVEY.md §4.2).  Raw hrefs are deliberately
non-canonical (uppercase hosts, :80 ports, dot-segments, fragments,
unsorted query params, relative paths) to exercise op F1; ~2% of links
dangle (404 lineage) and ~2% hit robots-disallowed /private/ paths.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta

from engine.pure import html_to_text, stable_hash

EPOCH = datetime(2024, 1, 1, 0, 0, 0)  # naive UTC, FIXTURES.md §2
_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo"
).split()

# size -> (N_hosts, mean pages/host)  (FIXTURES.md §2.5)
SIZES = {"S": (8, 12), "M": (200, 5000), "XS": (4, 6)}


@dataclass
class Corpus:
    pages: list[dict]  # url, warc_ts, html(bytes), text, lang
    seeds: list[tuple[str, int]]  # (raw non-canonical url, priority)
    robots: dict[str, list[str]]  # host -> disallow prefixes
    crawl_delay_ms: dict[str, int] = field(default_factory=dict)
    default_budget: int = 2
    budget_overrides: dict[str, int] = field(default_factory=dict)
    n_hosts: int = 0
    pages_per_host: list[int] = field(default_factory=list)


def _host(h: int) -> str:
    return f"h{h}.example.test"


def _url(h: int, k: int) -> str:
    return f"http://{_host(h)}/p/{k}"


def _zipf_sizes(n_hosts: int, mean_pages: int) -> list[int]:
    total = n_hosts * mean_pages
    weights = [(i + 1) ** -1.2 for i in range(n_hosts)]
    s = sum(weights)
    sizes = [max(2, int(total * w / s)) for w in weights]
    return sizes


def _raw_href(h: int, k: int, salt: str) -> str:
    """Render the target url (h, k) in one of several deliberately
    non-canonical but canon-equivalent forms, picked by stable_hash."""
    v = stable_hash(salt) % 6
    host, path = _host(h), f"/p/{k}"
    if v == 0:
        return f"http://{host.upper()}{path}"
    if v == 1:
        return f"http://{host}:80{path}"
    if v == 2:
        return f"http://{host}/a/../p/{k}"
    if v == 3:
        return f"http://{host}{path}#frag{k}"
    if v == 4:
        return f"http://{host}{path}?b=2&a=1&a="  # unsorted + empty-val pair
    return f"http://{host}{path}"


def _body_words(url: str, n: int = 24) -> str:
    h = stable_hash(url)
    base = [_LOREM[(h >> (i % 48)) % len(_LOREM) + 0] for i in range(min(n, 48))]
    if n <= 48:
        return " ".join(base)
    # large bodies (scaling corpus): tile the 48-word hash-derived base —
    # O(1) hashing per page instead of O(n) while staying deterministic.
    # Real web pages are markup-DENSE (the html parser does work per tag
    # event, not per byte), so wrap words in inline tags at a fixed cadence;
    # a single giant <p> of plain words would be unrealistically cheap to
    # extract and would understate extraction CPU in benchmarks.
    reps = -(-n // 48)
    words = (base * reps)[:n]
    out = []
    for j, w in enumerate(words):
        if j % 3 == 1:
            out.append(f"<b>{w}</b>")
        elif j % 7 == 2:
            out.append(f"<i>{w}</i>")
        else:
            out.append(w)
    return " ".join(out)


def _outlinks(h: int, k: int, n_hosts: int, sizes: list[int]) -> list[str]:
    url = _url(h, k)
    d = stable_hash(url) % 6
    hrefs: list[str] = []
    for i in range(d):
        salt = f"{url}/l{i}"
        r = stable_hash(salt) % 100
        if r < 2:  # dangling link -> 404
            hrefs.append(_raw_href(h, sizes[h] + 7 + i, salt + "x"))
        elif r < 4:  # robots-disallowed path
            hrefs.append(f"http://{_host(h)}/private/{k}-{i}")
        elif r < 70 + 4:  # same-host
            hrefs.append(_raw_href(h, (k * 7 + i) % sizes[h], salt))
        else:  # cross-host
            th = (h * 13 + i) % n_hosts
            hrefs.append(_raw_href(th, (k * 7 + i) % sizes[th], salt))
    return hrefs


def render_html(
    h: int,
    k: int,
    n_hosts: int,
    sizes: list[int],
    version: int = 1,
    body_words: int = 24,
) -> bytes:
    url = _url(h, k)
    body = _body_words(url, body_words) + (" v2 refresh" if version == 2 else "")
    links = "".join(
        f'<a href="{raw}">L{i}</a>' for i, raw in enumerate(_outlinks(h, k, n_hosts, sizes))
    )
    html = (
        f"<html><head><title>t{k}</title><style>.x{{}}</style></head>"
        f"<body><script>var a=1;</script><h1>Page {k}</h1>"
        f"<p>{body}</p>{links}</body></html>"
    )
    return html.encode("utf-8")


def _lang(url: str) -> str:
    r = stable_hash(url + "#lang") % 100
    return "en" if r < 90 else ("de" if r < 95 else "fr")


def gen_corpus(
    size: str = "S",
    compute_text: bool = True,
    n_hosts: int | None = None,
    mean_pages: int | None = None,
    body_words: int = 24,
) -> Corpus:
    """Generate the corpus; ``n_hosts``/``mean_pages`` override ``size``
    (used by bench.py to scale the synthetic frontier with the bench SF);
    ``body_words`` sizes each page's body (scaling corpus uses ~3000 ≈
    a realistic ~20 KB web page; default 24 keeps the golden S corpus)."""
    if n_hosts is None or mean_pages is None:
        n_hosts, mean_pages = SIZES[size]
    sizes = _zipf_sizes(n_hosts, mean_pages)
    pages: list[dict] = []
    for h in range(n_hosts):
        for k in range(sizes[h]):
            url = _url(h, k)
            ts = EPOCH + timedelta(seconds=stable_hash(url) % (30 * 86400))
            html = render_html(h, k, n_hosts, sizes, body_words=body_words)
            pages.append(
                {
                    "url": url,
                    "warc_ts": ts,
                    "html": html,
                    "text": html_to_text(html) if compute_text else "",
                    "lang": _lang(url),
                }
            )
            # ~5% of urls get a second, later warc snapshot (as-of op C5)
            if stable_hash(url + "#snap2") % 100 < 5:
                html2 = render_html(h, k, n_hosts, sizes, version=2, body_words=body_words)
                pages.append(
                    {
                        "url": url,
                        "warc_ts": ts + timedelta(days=40),
                        "html": html2,
                        "text": html_to_text(html2) if compute_text else "",
                        "lang": _lang(url),
                    }
                )

    seeds = []
    for h in range(min(8, n_hosts)):
        raw = f"HTTP://H{h}.EXAMPLE.TEST:80/p/0#top"
        seeds.append((raw, 100 if h == 0 else 100 - h))

    robots = {_host(h): ["/private/"] for h in range(n_hosts)}
    if n_hosts > 1:
        robots[_host(1)] = ["/private/", "/p/3"]  # a real, linked page
    delays = {_host(h): 0 for h in range(n_hosts)}
    delays[_host(0)] = 1000  # hottest host

    return Corpus(
        pages=pages,
        seeds=seeds,
        robots=robots,
        crawl_delay_ms=delays,
        default_budget=2,
        budget_overrides={_host(0): 1},
        n_hosts=n_hosts,
        pages_per_host=sizes,
    )


def write_parquet(corpus: Corpus, out_dir: str) -> dict[str, str]:
    """Write pages/seeds/robots as parquet via pyarrow (no Spark needed).

    Returns {table: path}.  Pages schema matches BASELINE.json:15 exactly:
    url string, warc_ts timestamp[us], html binary, text string, lang string.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    pages_schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    paths["pages"] = os.path.join(out_dir, "pages.parquet")
    # chunked write: the scaling corpus is ~10+ GB of html — stream row
    # groups instead of materializing one giant Arrow table
    chunk = 25_000
    with pq.ParquetWriter(paths["pages"], pages_schema) as w:
        for i in range(0, len(corpus.pages), chunk):
            w.write_table(
                pa.Table.from_pylist(
                    corpus.pages[i : i + chunk], schema=pages_schema
                )
            )

    seeds_tbl = pa.Table.from_pylist(
        [{"url": u, "priority": p} for u, p in corpus.seeds],
        schema=pa.schema([("url", pa.string()), ("priority", pa.int32())]),
    )
    paths["seeds"] = os.path.join(out_dir, "seeds.parquet")
    pq.write_table(seeds_tbl, paths["seeds"])

    robots_tbl = pa.Table.from_pylist(
        [
            {
                "host": host,
                "disallow": dis,
                "crawl_delay_ms": corpus.crawl_delay_ms.get(host, 0),
            }
            for host, dis in sorted(corpus.robots.items())
        ],
        schema=pa.schema(
            [
                ("host", pa.string()),
                ("disallow", pa.list_(pa.string())),
                ("crawl_delay_ms", pa.int32()),
            ]
        ),
    )
    paths["robots"] = os.path.join(out_dir, "robots.parquet")
    pq.write_table(robots_tbl, paths["robots"])
    return paths
