"""L-size crawl stress (VERDICT r3 #7): one decade past M — a ~10^7-URL
frontier, zipfian hosts, store-backed bloom seen path, local[16].

The L point is a STRUCTURE stress, not a throughput headline: it is where
driver/manifest-side costs that are invisible at 10^6 first show up —
manifest JSON size, per-read snapshot-listing scans, bootstrap canon-UDF
over the whole frontier, the bloom backfill over a 10^7-key seen set.
The worker reports per-round wall/cpu/util like every other bench; this
wrapper additionally times the store-side phases and records manifest
sizes so "the first structure that degrades" is a measured claim
(BENCH/l_crawl.json + the note in SURVEY.md §6).

Corpus: 1000 hosts x 10^4 mean pages (zipf 1.2) with body_words=24
(~0.5 KB html): at L the frontier machinery is the target — anti-join,
politeness window, seen deltas, shard updates — so pages stay small to
keep corpus generation and extraction from drowning the signal (the
extraction-CPU story is the scaling bench's job).

Usage:
    python scripts/bench_l.py          # writes BENCH/l_crawl.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_scaling import ensure_corpus  # noqa: E402

L_CORPUS = "/tmp/spark_graft_bench/l_1000x10000_w24"
L_HOSTS = 1000
L_MEAN_PAGES = 10_000
L_BODY_WORDS = 24


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int, default=16)
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--budget", type=int, default=250)
    p.add_argument("--corpus", default=L_CORPUS)
    p.add_argument(
        "--seen-filter", default="bloom", choices=["exact", "bloom", "auto"]
    )
    p.add_argument("--out", default="l_crawl.json")
    args = p.parse_args()

    ensure_corpus(
        args.corpus,
        n_hosts=L_HOSTS,
        mean_pages=L_MEAN_PAGES,
        body_words=L_BODY_WORDS,
    )

    worker = [
        os.path.join(REPO, "scripts", "bench_scaling.py"), "--worker",
        "--cpus", str(args.cpus), "--corpus", args.corpus,
        "--rounds", str(args.rounds), "--budget", str(args.budget),
        "--seen-filter", args.seen_filter,
    ]
    if shutil.which("spark-submit"):
        zip_path = "/tmp/spark_graft_bench/engine.zip"
        os.makedirs(os.path.dirname(zip_path), exist_ok=True)
        if os.path.exists(zip_path):
            os.remove(zip_path)
        subprocess.run(
            ["zip", "-qr", zip_path, "engine/", "fixtures/"],
            cwd=REPO, check=True,
        )
        cmd = [
            "spark-submit", "--master", f"local[{args.cpus}]",
            "--driver-memory", "80g", "--py-files", zip_path, *worker,
        ]
    else:
        cmd = [sys.executable, *worker]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{args.cpus - 1}", *cmd]
    print(
        f"=== L-size crawl, local[{args.cpus}], seen-filter="
        f"{args.seen_filter} ===",
        file=sys.stderr,
        flush=True,
    )
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=10800
    )
    sys.stderr.write(out.stderr[-4000:])
    if out.returncode != 0:
        print("L worker failed", file=sys.stderr)
        return 1
    res = json.loads(out.stdout.strip().splitlines()[-1])
    thr = res["fetched_total"] / res["round_sec_total"]

    # store-structure observation (reported by the worker before it
    # removes its store): per-snapshot manifest JSON bytes — the
    # driver-side O(1) claim is about these staying flat as crawl history
    # accumulates
    manifest_bytes = res.get("manifest_bytes", {})

    report = {
        "metric": "l_crawl_urls_per_sec",
        "value": round(thr, 1),
        "seen_filter": args.seen_filter,
        "per_core": round(thr / args.cpus, 1),
        "cpus": args.cpus,
        "budget_per_host": args.budget,
        "rounds": args.rounds,
        "corpus": {
            "path": args.corpus,
            "hosts": L_HOSTS,
            "mean_pages": L_MEAN_PAGES,
            "body_words": L_BODY_WORDS,
            "n_pages": res["n_pages"],
        },
        "manifest_bytes": manifest_bytes,
        "level": res,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", args.out), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
