#!/usr/bin/env python3
"""Generate COUNTS.json — the ONE source of truth for the registry /
survey / correctness counts (VERDICT r15 item 8: the round-15 closing
record disagreed with itself on the registry count because the numbers
were prose arithmetic; this derives them from artifacts instead).

Inputs: a graft.Verify output dir (oracle_sql.json = the full
registered-query map) and an oracle_check report log. Cross-checks the
three sources against each other and SURVEY.md §2, then writes
COUNTS.json at the repo root. Non-zero exit on any inconsistency.

Usage: python3 tools/make_counts.py <verifyOutDir> <oracleLog>
"""
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    out_dir, oracle_log = Path(sys.argv[1]), Path(sys.argv[2])

    registry = sorted(json.loads((out_dir / "oracle_sql.json").read_text()))
    log = oracle_log.read_text()
    matches = sorted(m.group(1) for m in
                     re.finditer(r"^(\S+): MATCH", log, re.M))
    mismatches = sorted(m.group(1) for m in
                        re.finditer(r"^(\S+): MISMATCH", log, re.M))

    survey = (ROOT / "SURVEY.md").read_text()
    s2 = next(s for s in survey.split("\n## ") if s.startswith("§2"))
    rows = [l for l in s2.splitlines()
            if l.startswith("| ") and not l.startswith("| id ")
            and not l.startswith("| ---")]
    survey_keys = set(re.findall(r"q[0-9]+[a-z0-9_]*_[a-z0-9_]+", s2))

    problems = []
    orphans = [q for q in registry if q not in survey_keys]
    if orphans:
        problems.append(f"registered queries absent from SURVEY §2: {orphans}")
    ghosts = sorted(survey_keys - set(registry))
    if ghosts:
        problems.append(f"SURVEY §2 gate keys not registered: {ghosts}")
    if mismatches:
        problems.append(f"oracle MISMATCH: {mismatches}")
    if set(matches) != set(registry):
        missing = sorted(set(registry) - set(matches))
        problems.append(f"registered but not MATCHed in the oracle log: {missing}")
    if problems:
        for p in problems:
            print(f"[make_counts] INCONSISTENT: {p}", file=sys.stderr)
        return 1

    counts = {
        "registry_queries": len(registry),
        "oracle_matches": len(matches),
        "survey_rows": len(rows),
        "spec_pinned_rows": len(rows) - len(
            [r for r in rows if re.search(r"q[0-9]+[a-z0-9_]*_[a-z0-9_]+", r)]),
    }
    (ROOT / "COUNTS.json").write_text(json.dumps(counts) + "\n")
    print(f"[make_counts] {counts}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
