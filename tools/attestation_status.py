"""Driver-attestation status of the oracle-backed registry: which queries
have at least one driver-recorded CORRECTNESS row (hash-checked at sf0.01
by the round harness) vs pytest-only oracle coverage (the full sweep in
tests/test_oracle_parity.py at sf0.001).

The driver window is 50 seats per round; the rotation plan
(registry.py _DRIVER_WINDOW comment) swaps attested representatives out
and never-attested queries in each round until every family member has a
driver row. This tool is the README's source for the split.

Usage: python tools/attestation_status.py [--list]
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
    attested: set[str] = set()
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        attested |= set(json.load(open(f)).keys())

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


if __name__ == "__main__":
    main()
