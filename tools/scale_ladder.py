#!/usr/bin/env python3
"""Maintain SCALE_LADDER.json — the machine-readable decade ladder
(VERDICT r15 next-round #5): per-gate engine/oracle seconds per corpus
scale, merged from graft.Verify's engine_seconds.json and
check_oracle.py's per-query report. SCALE.md references these numbers;
cross-round cost diffs read the artifact, not prose.

Usage:
    python3 tools/scale_ladder.py <scaleLabel> <verifyOutDir> <reportJson> [ladderPath]

e.g.  python3 tools/scale_ladder.py 1000x /tmp/graft_verify_1000x CORRECTNESS_1000x.json

Merge semantics: the ladder keeps one object per (scale, query); a rerun
of the same (scale, query) overwrites that entry and nothing else, so
subsets accumulate. `oracle_s` notes: the first IVF-family gate of a
partitioned replay absorbs the shared assignment-table build; a `null`
engine_s means the gate wasn't in that Verify subset.
"""
import json, os, sys

scale, outdir, report_path = sys.argv[1], sys.argv[2], sys.argv[3]
ladder_path = sys.argv[4] if len(sys.argv) > 4 else "SCALE_LADDER.json"

engine = {}
eng_path = os.path.join(outdir, "engine_seconds.json")
if os.path.exists(eng_path):
    engine = json.load(open(eng_path))
report = json.load(open(report_path)) if os.path.exists(report_path) else {}

ladder = json.load(open(ladder_path)) if os.path.exists(ladder_path) else {}
rung = ladder.setdefault(scale, {})
for q in sorted(set(engine) | set(report)):
    r = report.get(q, {})
    rung[q] = {
        "engine_s": engine.get(q),
        "oracle_s": r.get("oracle_s"),
        "rows": r.get("spark_rows"),
        "hash_match": r.get("hash_match"),
    }
with open(ladder_path, "w") as f:
    json.dump(ladder, f, indent=1, sort_keys=True)
print(f"ladder[{scale}]: merged {len(rung)} gates -> {ladder_path}")
