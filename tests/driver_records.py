"""Shared view of the driver's CORRECTNESS record.

Single definition site for "what is each query's latest driver row"
(code-review finding: three tests had diverging copies of the merge,
each with its own hard-coded round cap that would silently go stale).
Files are discovered by glob, so new rounds appear without edits.
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green(rec: dict) -> bool:
    return bool(rec.get("rows_match") and rec.get("schema_match")
                and rec.get("hash_match"))


def _rounds() -> list[tuple[int, dict]]:
    out = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        # the glob also matches non-canonical artifacts (e.g. a
        # CORRECTNESS_r16_run1.json scratch file, the BENCH_SF1_rNN_runK
        # naming convention) — skip them instead of crashing (r15 ADVICE)
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(path))
        if not m:
            continue
        with open(path) as f:
            out.append((int(m.group(1)), json.load(f)))
    return sorted(out)


def latest_rows() -> dict[str, dict]:
    """Latest driver CORRECTNESS row per query, later rounds winning
    (a red row overwrites an older green one — 'latest attestation')."""
    rows: dict[str, dict] = {}
    for _, recs in _rounds():
        rows.update(recs)
    return rows


def last_green_round() -> dict[str, int]:
    """Most recent round whose row was GREEN, per query (the staleness
    clock scripts/window_math.py rotates on)."""
    out: dict[str, int] = {}
    for n, recs in _rounds():
        for name, rec in recs.items():
            if green(rec):
                out[name] = n
    return out
