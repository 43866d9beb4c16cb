"""Driver-attestation status of the oracle-backed registry: which queries
have at least one driver-recorded CORRECTNESS row (hash-checked at sf0.01
by the round harness) vs pytest-only oracle coverage (the full sweep in
tests/test_oracle_parity.py at sf0.001).

The driver window is 50 seats per round; the rotation plan
(registry.py _DRIVER_WINDOW comment) swaps attested representatives out
and never-attested queries in each round until every family member has a
driver row. This tool is the README's source for the split.

Usage: python tools/attestation_status.py [--list] [--stale [N]]
  --list   names of never-driver-attested oracle-backed queries
  --stale  oldest-first (last_attested_round, name) for every attested
           row — the r13+ rotation source: with the never-attested
           backlog gone, window capacity recycles the stalest rows
           first (optionally only the first N)
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from magiceye_spark import registry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Only fully-green rows count as attested: an erred or mismatched driver
    # row proves the seat RAN, not that it's correct (r10's
    # embedding_normalize row erred in the driver's canonicalizer and was
    # counted — the r10 verdict's What's-wrong #2).
    attested: set[str] = set()
    erred: set[str] = set()
    last_round: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for name, row in json.load(open(f)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                attested.add(name)
                last_round[name] = max(last_round.get(name, 0), rnd)
            else:
                erred.add(name)
    erred -= attested

    oracle_backed = sorted(registry.oracles())
    window = list(registry._DRIVER_WINDOW)
    done = [n for n in oracle_backed if n in attested]
    pending = [n for n in oracle_backed if n not in attested]
    projected = sorted(set(done) | set(window))
    print(
        json.dumps(
            {
                "oracle_backed": len(oracle_backed),
                "driver_attested": len(done),
                "pytest_only": len(pending),
                # rows-only seats (no oracle) legitimately have None matches;
                # only oracle-backed seats can be "seated but never green"
                "never_green_but_seated_before": sorted(
                    erred & set(oracle_backed)
                ),
                "current_window_first_time": sorted(
                    set(window) - attested
                ),
                "projected_after_this_round": len(
                    [n for n in projected if n in oracle_backed]
                ),
            },
            indent=2,
        )
    )
    if "--list" in sys.argv:
        print("\nnever driver-attested (pytest-only oracle coverage):")
        for n in pending:
            print(" ", n)
    if "--stale" in sys.argv:
        i = sys.argv.index("--stale")
        limit = (
            int(sys.argv[i + 1])
            if i + 1 < len(sys.argv) and sys.argv[i + 1].isdigit()
            else None
        )
        # oldest-first, alphabetical within a round — the auditable
        # rotation rule: each round's free window capacity re-seats
        # exactly this prefix
        ordered = sorted(last_round.items(), key=lambda kv: (kv[1], kv[0]))
        print("\nlast driver-attested round (oldest first):")
        for n, r in ordered[: limit or len(ordered)]:
            print(f"  r{r:<3d} {n}")


if __name__ == "__main__":
    main()
