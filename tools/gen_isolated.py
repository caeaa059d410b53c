#!/usr/bin/env python3
"""Regenerate BENCH_ISOLATED.json from THIS round's actual bench numbers.

The round-9 verdict found the isolation protocol's crack: the isolated-query
list was frozen by hand from an old round's slow set, so a NEW regression
(q_dd_quantiles 6x) could miss the list entirely and go unadjudicated. This
script closes it mechanically:

  selection = (20 slowest queries of the given full-suite bench JSON)
            UNION (every query that moved >2x vs the previous round's JSON,
                   in either direction — a 2x speedup is just as much in
                   need of a steady-state number as a 2x regression)

Each selected query then runs ONE JVM per query (tools/runbench.sh), sf0.1,
best-of-N (default 3) with the per-query sf0.001 plan warmup graft.Bench
already does, and the result is written as BENCH_ISOLATED.json in the repo
root with the full-suite number recorded beside the isolated one.

Usage:
  python3 tools/gen_isolated.py BENCH_cur.json [BENCH_prev.json] \
      [--out BENCH_ISOLATED.json] [--round N] [--reps 3] [--top 20]

Run it against the DRIVER's official BENCH_r{N}.json (vs BENCH_r{N-1}.json),
not a builder-local run — the round-10 verdict found a >2x driver-side mover
that dodged adjudication because the list was generated from an earlier
builder bench. The driver's wrapper format parses directly.

The bench JSONs may be either graft.Bench's raw output line or the driver's
wrapper ({"tail": "..."} with a truncated prefix) — the parser recovers the
per-query map from the tail-heavy ordering in both cases.
"""
import argparse
import json
import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load_queries(path):
    """Return {query: seconds} from a bench JSON (raw or driver-wrapped)."""
    raw = Path(path).read_text()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = {"tail": raw}
    if isinstance(d, dict) and isinstance(d.get("queries"), dict):
        return {k: float(v) for k, v in d["queries"].items()}
    # Driver wrapper: the real JSON line is (possibly truncated at the FRONT)
    # inside "tail". graft.Bench orders queries fastest-first so truncation
    # drops cheap queries, never slow ones — regex-recover every "name":sec.
    tail = d.get("tail", "") if isinstance(d, dict) else raw
    pairs = re.findall(r'"(q_[A-Za-z0-9_]+)":(-?\d+(?:\.\d+)?)', tail)
    return {k: float(v) for k, v in pairs}


def select(cur, prev, top):
    slowest = sorted(cur, key=lambda q: -cur[q])[:top]
    movers = []
    for q, t in cur.items():
        p = prev.get(q)
        if p and p > 0 and t > 0 and (t / p >= 2.0 or p / t >= 2.0):
            movers.append(q)
    return sorted(set(slowest) | set(movers)), sorted(set(movers))


def run_isolated(query, sf_dir, reps, cpus):
    # inherit the caller's environment (java may live off /usr/bin) and
    # overlay only the bench knobs
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_REPS=str(reps),
        SPARK_GRAFT_QUERIES=query,
    )
    out = subprocess.run(
        [str(REPO / "tools" / "runbench.sh")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
    try:
        return json.loads(line)["queries"].get(query, -1.0)
    except (json.JSONDecodeError, KeyError):
        sys.stderr.write(f"[gen_isolated] {query} produced no JSON: {line!r}\n")
        return -1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("current")
    ap.add_argument("previous", nargs="?")
    ap.add_argument("--out", default=str(REPO / "BENCH_ISOLATED.json"))
    ap.add_argument("--round", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    cur = load_queries(args.current)
    prev = load_queries(args.previous) if args.previous else {}
    chosen, movers = select(cur, prev, args.top)
    print(f"[gen_isolated] {len(chosen)} queries "
          f"({args.top} slowest ∪ {len(movers)} >2x movers: {movers})")

    queries = {}
    for q in chosen:
        best = run_isolated(q, args.sf_dir, args.reps, args.cpus)
        # stable key whatever --reps is (downstream consumers look up
        # "isolated_best_sec"); reps recorded separately
        entry = {"isolated_best_sec": best,
                 "reps": args.reps,
                 "full_suite_sec": cur.get(q)}
        if q in movers and prev.get(q):
            entry["prev_full_suite_sec"] = prev[q]
        queries[q] = entry
        print(f"  {q}: isolated {best} (full-suite {cur.get(q)})")

    doc = {
        "protocol": (
            f"one JVM per query, local[{args.cpus}], {args.sf_dir}, per-query "
            f"sf0.001 plan warmup, best-of-{args.reps} "
            "(SPARK_GRAFT_QUERIES=<q> SPARK_GRAFT_REPS=N tools/runbench.sh)"
        ),
        "selection": (
            f"mechanical, regenerated each round by tools/gen_isolated.py: the "
            f"{args.top} slowest full-suite queries UNION all >2x movers vs the "
            "previous round — a new regression can no longer miss the list by "
            "being new"
        ),
        "why": (
            "full-suite per-query timings vary +/-30% under GC pressure; these "
            "are the steady-state numbers regressions should be judged against"
        ),
        "round": args.round,
        "queries": queries,
    }
    Path(args.out).write_text(json.dumps(doc, indent=4, sort_keys=False) + "\n")
    print(f"[gen_isolated] wrote {args.out}")


if __name__ == "__main__":
    main()
