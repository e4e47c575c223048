#!/usr/bin/env python3
"""Merge bench rehearsal floors for a round.

Usage: merge_rehearsals.py OUT PREV_FLOORS CHANGED_CSV REHEARSAL1 [REHEARSAL2 ...]

Element-wise min over the previous round's merged floors and this
round's full rehearsals, EXCEPT queries named in CHANGED_CSV (comma
separated): their semantics or cost accounting changed this round, so
their floors come only from this round's rehearsals (plus any seed
passed as `name=value` items inside CHANGED_CSV).
"""
import json
import sys

out, prev_path, changed_csv = sys.argv[1], sys.argv[2], sys.argv[3]
rehearsals = [json.load(open(p)) for p in sys.argv[4:]]
prev = json.load(open(prev_path))["queries"]

changed = {}
for item in changed_csv.split(","):
    if not item:
        continue
    if "=" in item:
        name, seed = item.split("=")
        changed[name] = float(seed)
    else:
        changed[item] = None

names = set()
for r in rehearsals:
    names |= set(r["queries"].keys())

floors = {}
for n in sorted(names):
    samples = [r["queries"][n] for r in rehearsals if n in r["queries"]]
    if n in changed:
        if changed[n] is not None:
            samples.append(changed[n])
    elif n in prev:
        samples.append(prev[n])
    floors[n] = min(samples)

for r in rehearsals:
    # passes >= 2 guarantees every query has a HOT sample (the paired
    # sweep); round 19's preseed phase + 186-query surface leave the
    # default deadline inside pass 3, so full-rep runs use a longer
    # local deadline instead (SPARK_GRAFT_DEADLINE_SEC)
    assert r["passes"] >= 2 and not r["failed"] and not r["cold_only"], r["passes"]

# ADVICE r19: a floor resting only on passes==2 rehearsals can sit on a
# single hot sample per query on a contended host — require at least one
# rehearsal in the merge to have run the longer deadline (passes >= 3),
# preserving the min-of-N defense the floor methodology is built on.
assert max(r["passes"] for r in rehearsals) >= 3, (
    "no rehearsal reached passes>=3 — rerun one with a longer "
    "SPARK_GRAFT_DEADLINE_SEC before merging floors")

doc = {
    "metric": "total",
    "value": sum(floors.values()),
    "unit": "sec",
    "queries": floors,
    "failed": [],
    "sf": rehearsals[0]["sf"],
    "passes": min(r["passes"] for r in rehearsals),
    "cold_only": [],
    "note": "",
}
json.dump(doc, open(out, "w"), indent=1)
print(f"{len(floors)} queries, total {sum(floors.values()):.1f}s, "
      f"{len(changed)} reseeded")
