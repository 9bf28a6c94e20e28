"""Rotation coverage ledger (round-10, VERDICT #6).

The driver's correctness gate hash-checks a ~50-query prefix of the
md5(name‖round) rotation each round (~14% of the registry), so some
queries may never have appeared in any committed CORRECTNESS_r*.json.
This tool makes that exposure auditable:

- for every registry query: which committed rounds sampled it;
- queries NEVER driver-sampled, grouped by module (the family grain);
- the residual blind spot: never driver-sampled AND not in
  ``tools/breadth_suite.py`` AND carrying an oracle (rows-only queries
  are the judge-visible weaker class by design).

Output: ``COVERAGE_LEDGER.json`` at the repo root + a human summary on
stdout. Pure bookkeeping — no Spark session; reads the committed
artifacts and imports the registry.

Usage: python tools/coverage_ledger.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    sys.path.insert(0, root)
    sys.path.insert(0, os.path.join(root, "tools"))

    from breadth_suite import FAMILY_REPRESENTATIVES

    from vmware_graph_spark.queries import ORACLE, QUERIES

    sampled: dict[str, list[int]] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        rounds.append(rnd)
        with open(path) as f:
            for name in json.load(f):
                sampled.setdefault(name, []).append(rnd)

    names = sorted(QUERIES)
    never = [n for n in names if n not in sampled]
    by_module: dict[str, dict] = {}
    for n in names:
        mod = QUERIES[n].__module__.rsplit(".", 1)[-1]
        m = by_module.setdefault(mod, {"total": 0, "driver_sampled": 0, "never": []})
        m["total"] += 1
        if n in sampled:
            m["driver_sampled"] += 1
        else:
            m["never"].append(n)

    # round-11 (VERDICT #4): the breadth suite is now the FULL
    # oracle-paired registry (quick spanning reps first), so the blind
    # spot is closed by construction; the committed per-round evidence
    # it RAN is the latest SELFCHECK_r*.txt, parsed below.
    from breadth_suite import full_suite

    suite = set(full_suite())
    blind = [n for n in never if n not in suite and n in ORACLE]

    import re

    sc_paths = sorted(
        glob.glob(os.path.join(root, "SELFCHECK_r*.txt")),
        key=lambda p: int(
            os.path.basename(p)[len("SELFCHECK_r"):-len(".txt")]
        ),
    )
    latest_selfcheck: dict = {"artifact": None}
    if sc_paths:
        with open(sc_paths[-1], errors="replace") as f:
            txt = f.read()
        checked = set(re.findall(r"(?:PASS|BOUND-PASS) ([A-Za-z0-9_]+)", txt))
        missing = sorted(n for n in names if n not in checked)
        latest_selfcheck = {
            "artifact": os.path.basename(sc_paths[-1]),
            "value_checked": len(checked & set(names)),
            "registry_missing_from_artifact": missing,
        }

    ledger = {
        "rounds_seen": rounds,
        "registry_total": len(names),
        "driver_sampled_ever": len(names) - len(never),
        "never_driver_sampled": never,
        "breadth_suite_size": len(suite),
        "breadth_quick_prefix_size": len(FAMILY_REPRESENTATIVES),
        "never_sampled_and_not_in_breadth_suite_with_oracle": blind,
        "latest_selfcheck": latest_selfcheck,
        "by_module": {
            k: v for k, v in sorted(
                by_module.items(),
                key=lambda kv: kv[1]["driver_sampled"] / kv[1]["total"],
            )
        },
    }
    out = os.path.join(root, "COVERAGE_LEDGER.json")
    with open(out, "w") as f:
        json.dump(ledger, f, indent=2)

    print(
        f"registry {len(names)}: {ledger['driver_sampled_ever']} driver-sampled "
        f"across rounds {rounds}, {len(never)} never sampled "
        f"({len(blind)} also outside breadth_suite, oracle-paired)"
    )
    worst = [k for k, v in ledger["by_module"].items()][:5]
    for k in worst:
        v = by_module[k]
        print(f"  {k}: {v['driver_sampled']}/{v['total']} sampled")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
