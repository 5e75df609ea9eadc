"""Compute the driver-window rotation arithmetic for the NEXT round.

Reads every CORRECTNESS_r*.json plus the live registry and prints, per
query, the most recent green round; then the staleness buckets and the
suggested next-round window under the standing rules:

  1. never-green and latest-red rows seat first (hard);
  2. new registrations seat at registration (hard);
  3. rewritten rows seat at the round after the rewrite (hard): a row
     in __spark_entry__.REWRITTEN whose rewrite round is newer than its
     last green attestation re-attests at the next window's head (the
     r13 judge's item 2 — staleness alone missed "code changed since
     last attestation");
  4. rows N rounds stale rotate in oldest-first (3 = obligation, 4 =
     ceiling — a deferral must be written into the window comment);
  5. overflow defers the lowest-risk rows (untouched small-result TPC-H
     first) to the following round.

Usage: python scripts/window_math.py [next_round_number]
"""
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLE = 50


def green(rec: dict) -> bool:
    return bool(rec.get("rows_match") and rec.get("schema_match")
                and rec.get("hash_match") and not rec.get("err"))


def main() -> None:
    import __spark_entry__ as E

    rounds = sorted(
        int(m.group(1)) for f in os.listdir(REPO)
        if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f)))
    last_green: dict[str, int] = {}
    latest_row: dict[str, tuple[int, dict]] = {}
    for n in rounds:
        with open(os.path.join(REPO, f"CORRECTNESS_r{n:02d}.json")) as fh:
            for name, rec in json.load(fh).items():
                latest_row[name] = (n, rec)
                if green(rec):
                    last_green[name] = n
    nxt = int(sys.argv[1]) if len(sys.argv) > 1 else (max(rounds) + 1)
    qs = list(E.queries())
    retired = sorted(getattr(E, "RETIRED_SEATS", {}))
    cap = 3 * SAMPLE
    print(f"registry={len(qs)} (capacity {cap} = {SAMPLE} seats x 3-round "
          f"ceiling; retired={len(retired)})  rounds seen={rounds}  "
          f"next round=r{nxt}")
    if len(qs) > cap:
        print(f"** OVER CAPACITY by {len(qs) - cap}: retire near-redundant "
              f"latest-green rows (RETIRED_SEATS) before registering **")
    if retired:
        print(f"retired (full-registry parity + bench only): {retired}")

    never = [n for n in qs if n not in last_green]
    latest_red = [n for n, (r, rec) in latest_row.items()
                  if n in qs and not green(rec)
                  and last_green.get(n, -1) < r]
    # rewrite-resets-staleness (r13 judge item 2): a driver-visible row
    # whose query path was rewritten AFTER its last attestation is a
    # hard seat regardless of staleness bucket (strict >: the driver
    # attests at round end, so same-round attestation covers a rewrite).
    # The seating obligation is round R+1 (the round-R window was built
    # before the rewrite landed), so a rewrite at `nxt` itself is not
    # due yet — it shows up when this tool plans nxt+1
    rewritten_cfg: dict[str, int] = getattr(E, "REWRITTEN", {})
    rewritten = sorted(
        n for n in qs
        if n in last_green and last_green[n] < rewritten_cfg.get(n, -1) < nxt)
    by_age: dict[int, list[str]] = {}
    for n in qs:
        if n in last_green and n not in rewritten:
            by_age.setdefault(nxt - last_green[n], []).append(n)
    print(f"never-green (hard seats): {len(never)} {never}")
    print(f"latest-red (hard seats): {len(latest_red)} {latest_red}")
    print(f"rewritten since last attestation (hard seats): "
          f"{len(rewritten)} {rewritten}")
    for age in sorted(by_age, reverse=True):
        tag = ("HARD (>=4 rounds, past ceiling)" if age >= 4 else
               "obligation (3 rounds)" if age == 3 else "")
        print(f"stale {age} rounds: {len(by_age[age])} {tag}")
        if age >= 3:
            for n in sorted(by_age[age]):
                print(f"    {n}")
    def unseated_staged_by_round() -> dict[int, list[str]]:
        """round -> unseated seat candidates, scanning EVERY
        registry_staged_r* module (not just next round's): a staging
        module whose seating slipped past its target round must keep
        appearing in the arithmetic, at the next round that can seat
        it, until it is actually registered."""
        import importlib
        import pkgutil

        import kafka_connect_oss_spark as pkg

        out: dict[int, list[str]] = {}
        for m in pkgutil.iter_modules(pkg.__path__):
            mm = re.fullmatch(r"registry_staged_r(\d+)", m.name)
            if not mm:
                continue
            mod = importlib.import_module(
                f"kafka_connect_oss_spark.{m.name}")
            pend = sorted(set(getattr(mod, "STAGED_QUERIES", {})) - set(qs))
            if pend:
                out[int(mm.group(1))] = pend
        return out

    staged_by_round = unseated_staged_by_round()

    def staged_for(round_no: int) -> list[str]:
        """Candidates due AT OR BEFORE round_no and not yet simulated."""
        return sorted(n for r, ns in staged_by_round.items()
                      if r <= round_no for n in ns)

    staged = staged_for(nxt)
    if staged:
        overdue = sorted(n for r, ns in staged_by_round.items()
                         if r < nxt for n in ns)
        print(f"staged seats awaiting registration (seat at the head — "
              f"seating outranks staleness): {len(staged)} {staged}"
              + (f"  ** {len(overdue)} OVERDUE from an earlier round: "
                 f"{overdue} **" if overdue else ""))
    hard = never + latest_red + rewritten + [n for a, ns in by_age.items()
                                             if a >= 4 for n in ns]
    oblig = by_age.get(3, [])
    # a staging cohort due at or before `nxt` brings its planned
    # retirement trade with it — fold those retirements into the
    # primary arithmetic instead of crying OVERFLOW for a solved round
    # (r15 VERDICT item 6)
    planned_ret = set()
    for r0 in staged_by_round:
        if r0 <= nxt:
            planned_ret |= set(getattr(E, f"PLANNED_R{r0}_RETIREMENTS", {}))
    retiring = sorted(planned_ret & (set(hard) | set(oblig)))
    if retiring:
        hard = [n for n in hard if n not in planned_ret]
        oblig = [n for n in oblig if n not in planned_ret]
        print(f"planned retirements folded out of the seat count: "
              f"{retiring}")
    total = len(hard) + len(oblig) + len(staged)
    print(f"\nseats: hard={len(hard)} + staged={len(staged)} + "
          f"3-round obligation={len(oblig)} = {total} of {SAMPLE}"
          + ("  ** OVERFLOW: defer the tail (TPC-H small-result first) **"
             if total > SAMPLE else f"  ({SAMPLE - total} spare)"))

    # forward forecast (the r12 capacity-policy done-criterion): simulate
    # each future round seating hard rows first then oldest-first up to
    # SAMPLE, all seats assumed green; report any row that would sit
    # >= 4 rounds stale AFTER that round's seating — with the registry at
    # capacity this must stay zero. Future staged modules
    # (registry_staged_r{r}) and their paired retirement plans
    # (E.PLANNED_R{r}_RETIREMENTS) are applied at their target round.
    sim = dict(last_green)
    live = list(qs)
    seated_in_sim: set[str] = set()
    for r in range(nxt, nxt + 3):
        # each staging cohort seats at its target round (or the first
        # simulated round after, if seating slipped), and brings its
        # same-round retirement plan with it
        seats: list[str] = []
        retire: set[str] = set()
        for r0 in sorted(staged_by_round):
            if r0 > r:
                continue
            pend = [n for n in staged_by_round[r0]
                    if n not in seated_in_sim]
            if pend:
                seats += pend
                retire |= set(getattr(E, f"PLANNED_R{r0}_RETIREMENTS", {}))
        seated_in_sim.update(seats)
        retire = sorted(retire & set(live))
        if retire or seats:
            live = [n for n in live if n not in retire] + seats
            print(f"forecast r{r} plan: +{len(seats)} staged {seats} "
                  f"-{len(retire)} retired {retire} -> registry {len(live)}")
        # staged seats are hard (seat at registration), then rewritten-
        # since-attestation rows (the r14 rule; due from rewrite+1 on),
        # then oldest-first
        rest = sorted(
            (n for n in live if n not in seats),
            key=lambda n: (0 if (sim.get(n, -10**9)
                                 < rewritten_cfg.get(n, -1) < r)
                           else 1, sim.get(n, -10**9)))
        if len(seats) > SAMPLE:
            # a pile-up of staging cohorts beyond the sample size would
            # make rest[:negative] silently truncate from the tail and
            # the forecast arithmetic wrong — surface it instead
            print(f"forecast r{r}: ** OVER-CAPACITY: {len(seats)} staged "
                  f"seats exceed the {SAMPLE}-row sample; "
                  f"{len(seats) - SAMPLE} cannot seat this round **")
        window = set(seats) | set(rest[:max(SAMPLE - len(seats), 0)])
        over = [n for n in live
                if n not in window and r - sim.get(n, -10**9) >= 4]
        for n in window:
            sim[n] = r
        print(f"forecast r{r}: seats oldest {len(window)}; "
              f"rows left >=4-stale after seating: {len(over)} "
              f"{over if over else ''}")


if __name__ == "__main__":
    main()
