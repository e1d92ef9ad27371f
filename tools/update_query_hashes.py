"""Refresh QUERY_HASHES.json — the per-query source-hash snapshot behind
the sweep ordering's "changed since last clean driver check" priority
(randas_spark.queries._ordered_names).

For every query whose most recent CORRECTNESS_r*.json row (across ALL
rounds) is clean — no err, no hash fail — record the current fn+oracle
source hash; entries for other names are kept as-is so an unverified edit
keeps flagging. Run this at the START of a round, before editing queries,
so the snapshot reflects the code the driver actually verified.

Usage: python tools/update_query_hashes.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from randas_spark.queries import REGISTRY, load_all, source_hash

    load_all()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snap_path = os.path.join(root, "QUERY_HASHES.json")
    try:
        with open(snap_path) as f:
            snap = json.load(f)
    except (OSError, ValueError):
        snap = {}

    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    last_clean: dict[str, bool] = {}
    for path in files:
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            last_clean[name] = not (row.get("err") or row.get("hash_match") is False)

    updated = 0
    for name, clean in last_clean.items():
        if clean and name in REGISTRY:
            snap[name] = source_hash(REGISTRY[name])
            updated += 1

    snap = {k: snap[k] for k in sorted(snap) if k in REGISTRY}
    with open(snap_path, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{updated} refreshed from {len(files)} correctness files; "
          f"{len(snap)} total entries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
