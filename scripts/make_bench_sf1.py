"""Produce BENCH_SF1_r{N}.json with per-query spreads AND
round-comparable subset totals (r07 VERDICT items 4 and 9: single-rep
sf1 rows produced phantom 2-3x readings two rounds running, and raw
suite totals mislead because the suite grows every round).

Runs bench.py at the sf1 dir (min-of-REPS per query, spreads recorded by
bench.py itself into BENCH_DETAIL.json), then writes the artifact with:

  queries   min-of-reps per query
  spread    max-min across reps per query (noise band; an apparent
            regression smaller than its spread is noise by definition)
  reps      rep count
  value     full-suite total (NOT comparable round-over-round)
  comparable_vs_<prev>  {queries: n, this_round: s, prev_round: s} —
            totals over the INTERSECTION of query sets with the previous
            round's artifact, the honest round-over-round anchor

Usage: python scripts/make_bench_sf1.py BENCH_SF1_r08.json [prev...]
Env: SPARK_GRAFT_SF_DIR (default /tmp/spark_graft_sf1),
     SPARK_GRAFT_BENCH_REPS (default 3).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SF1_r08.json"
prevs = sys.argv[2:] or ["BENCH_SF1_r07.json"]

env = dict(os.environ)
env.setdefault("SPARK_GRAFT_SF_DIR", "/tmp/spark_graft_sf1")
env.setdefault("SPARK_GRAFT_BENCH_REPS", "3")

# bench.py writes full detail (incl. spreads) to BENCH_DETAIL.json;
# preserve the sf0.1 detail file around the sf1 run
detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
saved = None
if os.path.exists(detail_path):
    with open(detail_path) as f:
        saved = f.read()
try:
    res = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True,
                         timeout=7200)
    sys.stderr.write(res.stderr[-2000:])
    # a dead bench must not silently package a stale BENCH_DETAIL.json
    # from a prior run as this round's sf1 artifact (r08 ADVICE)
    if res.returncode != 0:
        raise SystemExit(f"bench.py exited {res.returncode}")
    with open(detail_path) as f:
        detail = json.load(f)
finally:
    if saved is not None:
        with open(detail_path, "w") as f:
            f.write(saved)

out = {
    "metric": detail["metric"],
    "value": detail["value"],
    "unit": "sec",
    "reps": detail["reps"],
    "sf_dir": detail["sf_dir"],
    "queries": detail["queries"],
    "spread": detail["spread"],
    "headline_r01_total": detail["headline_r01_total"],
}
# ambient probes (bench.py r10 _calibrate; absent in older details)
for k in ("calib_before", "calib_after"):
    if k in detail:
        out[k] = detail[k]
for prev in prevs:
    ppath = os.path.join(REPO, prev)
    if not os.path.exists(ppath):
        continue
    with open(ppath) as f:
        p = json.load(f)
    pq = p.get("queries", {})
    common = sorted(set(pq) & set(out["queries"]))
    out[f"comparable_vs_{prev.replace('.json', '')}"] = {
        "n_queries": len(common),
        "this_round_total": round(sum(out["queries"][q] for q in common), 2),
        "prev_round_total": round(sum(float(pq[q]) for q in common), 2),
    }
with open(os.path.join(REPO, out_name), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({k: v for k, v in out.items() if k != "queries"
                  and k != "spread"}, indent=1))
