"""Audit the driver-correctness WINDOW rotation policy.

The driver's gate checks only the FIRST 50 ``queries()`` keys each round
(CORRECTNESS_r0N.json has 50 rows). This audit reads every recorded
round file and the current dict order and reports, per query, the age of
its newest hash-green driver evidence — flagging:

- queries with NO driver evidence that are NOT in the current window
  (they would stay unverified another full round), and
- queries whose evidence is a full rotation CYCLE old but are not
  scheduled for re-verification this round. With N queries and a
  50-slot window the best achievable cadence re-verifies each query
  every ceil(N/50) rounds; a query last green in round R must re-enter
  the window no later than round R + ceil(N/50), so the stale flag is
  age >= ceil(N/50) while out-of-window. (The previous fixed age>=2
  threshold was unsatisfiable once the inventory crossed 100.)

SETTLED TIER (capacity relief as the inventory grows): a query that has
been hash-green in >= 3 DISTINCT driver rounds has proven stability
across three separate driver environments — its evidence decays slower,
so its stale allowance doubles to 2·cycle. New and once-checked queries
keep the strict cadence; the tier exists so genuinely NEW operators
never wait a full cycle behind long-settled ones for a window slot.
The tier never relaxes the never-checked flag.

Usage: python tools/audit_window.py   (run from the repo root)
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, ".")

WINDOW = 50


def main() -> int:
    import __spark_entry__ as e

    keys = list(e.queries())
    window = set(keys[:WINDOW])

    last_green: dict[str, int] = {}
    n_green_rounds: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path)
        rnd = int(m.group(1))
        rounds.append(rnd)
        for name, row in json.load(open(path)).items():
            if row.get("hash_match") is True:
                last_green[name] = max(last_green.get(name, 0), rnd)
                n_green_rounds[name] = n_green_rounds.get(name, 0) + 1
    this_round = (max(rounds) if rounds else 0) + 1

    cycle = -(-len(keys) // WINDOW)  # ceil: best achievable re-check cadence

    # Queries born AFTER the current round's rotation locked a full
    # window (declared in models/testdata_queries.py). The exemption is
    # a CONTRACT, not a loophole: it only applies while the query has
    # no evidence at all AND the reserved new-operator capacity (6
    # slots) is not exceeded; once any driver round has run after their
    # birth (they have evidence, or a later rotation happened) they are
    # ordinary queries again — and if they are still evidence-less and
    # out-of-window at the NEXT rotation, the normal flag fires.
    from healthcare_dbt_datamart_spark.models.testdata_queries import (
        SCHEDULED_NEXT_WINDOW,
    )

    scheduled = set(SCHEDULED_NEXT_WINDOW)
    if len(scheduled) > 6:
        print(f"SCHEDULED_NEXT_WINDOW over capacity: {len(scheduled)} > 6")
    problems = []
    ages: dict[int, int] = {}
    for i, k in enumerate(keys):
        age = this_round - last_green[k] if k in last_green else None
        in_w = i < WINDOW
        if age is not None:
            ages[age] = ages.get(age, 0) + 1
        if age is None and not in_w:
            if k in scheduled and len(scheduled) <= 6:
                continue  # born post-rotation; must lead the next window
            problems.append(f"NEVER-CHECKED OUT-OF-WINDOW: {k} (pos {i + 1})")
        elif age is not None and not in_w:
            settled = n_green_rounds.get(k, 0) >= 3
            allowance = 2 * cycle if settled else cycle
            if age >= allowance:
                tier = "settled" if settled else "strict"
                problems.append(
                    f"STALE OUT-OF-WINDOW: {k} (pos {i + 1}, "
                    f"last green r{last_green[k]}, {tier} tier)"
                )

    n_new_in_window = sum(1 for k in keys[:WINDOW] if k not in last_green)
    n_settled = sum(1 for k in keys if n_green_rounds.get(k, 0) >= 3)
    print(
        f"{len(keys)} queries; window {WINDOW}; rotation cycle {cycle} rounds; "
        f"{n_new_in_window} never-driver-checked queries lead the window; "
        f"{n_settled} settled (>=3 green rounds, 2x allowance); "
        f"judging round r{this_round}; evidence-age histogram "
        f"{dict(sorted(ages.items()))} (+{len(keys) - sum(ages.values())} never)"
    )
    for p in problems:
        print(p)
    print(f"FLAGGED: {len(problems)}")
    return 1 if any(p.startswith("NEVER") for p in problems) else 0


if __name__ == "__main__":
    raise SystemExit(main())
