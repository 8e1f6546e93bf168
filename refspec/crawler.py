"""Single-process reference crawler — the executable spec (SURVEY.md §0.2).

Implements the pinned round semantics of SURVEY.md §3.2 with dicts and
loops.  The Spark engine (engine/crawl.py) must produce, on the same
corpus + seed list + politeness budget:

- the identical fetch sequence ``(round, url)`` (lineage sorted by round,
  then url — set semantics within a round, total order via the url
  tie-break),
- the identical final URL-seen set,
- byte-identical extracted ``text`` per url (both sides call
  engine.pure.html_to_text).

Pinned details that the prose spec leaves implicit:

- robots-blocked candidates are removed from the frontier AND added to the
  seen set (status never fetched, no lineage row) — otherwise blocked URLs
  would sit in the frontier forever and the crawl could not terminate.
- pages with multiple warc snapshots per url resolve to the row with the
  greatest warc_ts (as-of semantics, SURVEY.md §2 C5).
- frontier merge lattice (op H3): per url_hash take min(discovered_round),
  max(priority), min(depth), min(src_url) — field-wise, order-insensitive.
- fetch_seq is a dense global counter over selected urls ordered by
  (round, url).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from engine.pure import canon, extract_links, hash64, html_to_text


@dataclass(frozen=True)
class CrawlConfig:
    """Pinned crawl inputs (SURVEY.md §1.2 'crawl config')."""

    seeds: tuple[tuple[str, int], ...]  # (url possibly non-canonical, priority)
    default_budget: int = 2
    budget_overrides: dict[str, int] = field(default_factory=dict)
    max_rounds: int = 100

    def budget(self, host: str) -> int:
        return self.budget_overrides.get(host, self.default_budget)


@dataclass
class RefCrawlResult:
    # lineage rows: (round, host, url_hash, url, status, n_links, text_bytes, fetch_seq)
    lineage: list[tuple]
    seen: dict[int, str]  # url_hash -> canonical url
    texts: dict[str, str]  # url -> extracted text (200s only)

    def fetch_log(self) -> list[tuple[int, str, str, str]]:
        """(round, url, status, host) sorted by (round, url) — the crawl
        ordering artifact compared against the engine."""
        return sorted((r[0], r[3], r[4], r[1]) for r in self.lineage)


def _host_of(url: str) -> str:
    # canonical urls: scheme://host[:port]/...
    rest = url.split("://", 1)[1]
    return rest.split("/", 1)[0]


def _path_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    i = rest.find("/")
    path = rest[i:] if i >= 0 else "/"
    q = path.find("?")
    return path[:q] if q >= 0 else path


def _blocked(path: str, disallow: list[str] | None) -> bool:
    return any(path.startswith(d) for d in disallow or ())


def run_crawl(
    pages: list[dict],
    robots: dict[str, list[str]],
    config: CrawlConfig,
) -> RefCrawlResult:
    """Run the full pinned crawl; see module docstring for semantics.

    ``pages`` rows need keys url (canonical), warc_ts (comparable), html
    (bytes).  ``robots`` maps host -> disallow path-prefix list.
    """
    # --- page store with as-of resolution: url -> html of max warc_ts
    store: dict[str, tuple] = {}
    for row in pages:
        u = row["url"]
        prev = store.get(u)
        if prev is None or row["warc_ts"] > prev[0]:
            store[u] = (row["warc_ts"], row["html"])

    # --- frontier_0 from seeds: canon + hash, merge dups by max priority
    frontier: dict[int, dict] = {}

    def merge(h: int, url: str, priority: int, depth: int, round_: int, src: str) -> None:
        e = frontier.get(h)
        if e is None:
            frontier[h] = {
                "url": url,
                "host": _host_of(url),
                "priority": priority,
                "depth": depth,
                "discovered_round": round_,
                "src_url": src,
            }
        else:  # field-wise lattice merge (op H3)
            e["priority"] = max(e["priority"], priority)
            e["depth"] = min(e["depth"], depth)
            e["discovered_round"] = min(e["discovered_round"], round_)
            e["src_url"] = min(e["src_url"], src)

    for raw_url, priority in config.seeds:
        cu = canon(raw_url)
        if cu is None:
            continue
        merge(hash64(cu), cu, priority, 0, 0, "")

    seen: dict[int, str] = {}
    lineage: list[tuple] = []
    texts: dict[str, str] = {}
    fetch_seq = 0

    for rnd in range(config.max_rounds):
        if not frontier:
            break
        # 1. candidates := frontier ANTI seen (invariant: already disjoint)
        candidates = [(h, e) for h, e in frontier.items() if h not in seen]
        # 2. robots gate
        gated, blocked = [], []
        for h, e in candidates:
            if _blocked(_path_of(e["url"]), robots.get(e["host"])):
                blocked.append((h, e))
            else:
                gated.append((h, e))
        # 3. per-host top-B by (priority DESC, discovered_round ASC, url ASC)
        by_host: dict[str, list] = {}
        for h, e in gated:
            by_host.setdefault(e["host"], []).append((h, e))
        selected: list[tuple[int, dict]] = []
        for host, rows in by_host.items():
            rows.sort(key=lambda he: (-he[1]["priority"], he[1]["discovered_round"], he[1]["url"]))
            selected.extend(rows[: config.budget(host)])
        # 4-6. fetch + extract + lineage, in (round, url) order for fetch_seq
        selected.sort(key=lambda he: he[1]["url"])
        links_per_parent: list[tuple[dict, list[str]]] = []
        for h, e in selected:
            url = e["url"]
            hit = store.get(url)
            if hit is None:
                status, n_links, text_bytes = "404", 0, 0
            else:
                status = "200"
                text = html_to_text(hit[1]) or ""
                links = extract_links(hit[1], url) or []
                texts[url] = text
                n_links, text_bytes = len(links), len(text.encode("utf-8"))
                links_per_parent.append((e, links))
            lineage.append((rnd, e["host"], h, url, status, n_links, text_bytes, fetch_seq))
            fetch_seq += 1
        # 7. advance seen + frontier: selected and robots-blocked leave the
        # frontier and enter seen; children merge in, deduped vs seen_{r+1}
        for h, e in selected + blocked:
            seen[h] = e["url"]
            frontier.pop(h, None)
        for parent, links in links_per_parent:
            child_pri = max(0, parent["priority"] - 1)
            for dst in links:
                dh = hash64(dst)
                if dh in seen:
                    continue
                merge(dh, dst, child_pri, parent["depth"] + 1, rnd + 1, parent["url"])

    return RefCrawlResult(lineage=lineage, seen=seen, texts=texts)
