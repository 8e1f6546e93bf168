"""M-size crawl bench (SURVEY.md §6 / FIXTURES §2.5): the ~10^6-URL
frontier data point the 10^10 design claims rest on — two-phase
range-partitioned fetch_seq, append-only seen deltas, manifest-carried
offsets — all exercised at 3x the scaling corpus.

One parallelism level (local[16] by default — the widest honestly-scaling
level on this VM, see bench_scaling.substrate_eff), measured with the same
worker protocol as the scaling bench: unmeasured warm-up (pages index +
UDF touch), whole-corpus bootstrap frontier with 25% pre-seen, then
measured crawl rounds.

Usage:
    python scripts/bench_m.py               # writes BENCH/m_crawl.json
Corpus: fixtures SIZES["M"] = (200 hosts, 5000 mean pages) — ~10^6 urls,
body_words=600 (~6 KB html; the M point stresses FRONTIER size, the
scaling bench stresses extraction CPU).
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

M_CORPUS = "/tmp/spark_graft_bench/m_200x5000_w600"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int, default=16)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--budget", type=int, default=1000)
    p.add_argument("--corpus", default=M_CORPUS)
    p.add_argument("--seen-filter", default="exact", choices=["exact", "bloom", "auto"])
    p.add_argument("--out", default="m_crawl.json")
    args = p.parse_args()

    ensure_corpus(args.corpus, n_hosts=200, mean_pages=5000, body_words=600)

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
            "--driver-memory", "56g", "--py-files", zip_path, *worker,
        ]
    else:
        cmd = [sys.executable, *worker]
    # same N-core pinning as the scaling bench levels
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{args.cpus - 1}", *cmd]
    print(f"=== M-size crawl, local[{args.cpus}] ===", file=sys.stderr, flush=True)
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=5400)
    sys.stderr.write(out.stderr[-4000:])
    if out.returncode != 0:
        print("M worker failed", file=sys.stderr)
        return 1
    res = json.loads(out.stdout.strip().splitlines()[-1])
    thr = res["fetched_total"] / res["round_sec_total"]
    report = {
        "metric": "m_crawl_urls_per_sec",
        "value": round(thr, 1),
        "seen_filter": args.seen_filter,
        "per_core": round(thr / args.cpus, 1),
        "cpus": args.cpus,
        "budget_per_host": args.budget,
        "rounds": args.rounds,
        "corpus": {
            "path": args.corpus,
            "hosts": 200,
            "mean_pages": 5000,
            "body_words": 600,
            "n_pages": res["n_pages"],
        },
        "level": res,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", args.out), "w") as f:
        json.dump(report, f, indent=2)
    # refresh BASELINE.md so the M row lands in the results table
    scaling_path = os.path.join(REPO, "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        from bench_scaling import _write_md

        with open(scaling_path) as fh:
            rep = json.load(fh)
        _write_md(rep, os.path.join(REPO, "BENCH", "BASELINE.md"))
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
