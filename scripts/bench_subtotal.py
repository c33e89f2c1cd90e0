"""Compute the r1-comparable 22-query subtotal of a bench JSON against
BENCH_r03.json's query set (the best-round reference: 14.82 s; the r1
operative baseline: 30.06 s) — the number every round's quiet-box note
stamps into COVERAGE.md.

Usage: python scripts/bench_subtotal.py BENCH_r09_quietbox.json
"""

from __future__ import annotations

import json
import sys


def _parsed(path: str) -> dict:
    with open(path) as fh:
        raw = json.load(fh)

    def _valid(obj: object) -> bool:
        return (
            isinstance(obj, dict)
            and isinstance(obj.get("queries"), dict)
            and isinstance(obj.get("value"), (int, float))
        )

    if _valid(raw):
        return raw
    if _valid(raw.get("parsed")) if isinstance(raw, dict) else False:
        return raw["parsed"]
    if isinstance(raw, dict):
        # Driver-wrapped shape: the bench JSON line embedded in a stdout blob.
        for v in raw.values():
            if isinstance(v, str) and '"metric"' in v:
                for line in reversed(v.split("\n")):
                    if '"metric"' not in line:
                        continue
                    try:
                        cand = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if _valid(cand):
                        return cand
    raise SystemExit(
        f"{path}: no bench JSON with 'queries' dict + numeric 'value' found"
    )


def main() -> None:
    ref = _parsed("BENCH_r03.json")
    ref_set = set(ref["queries"])
    cur = _parsed(sys.argv[1])
    common = {k: cur["queries"][k] for k in ref_set if k in cur["queries"]}
    missing = ref_set - set(common)
    sub = sum(common.values())
    print(f"r3 reference total : {sum(ref['queries'].values()):.2f}s over {len(ref_set)}")
    print(f"current subtotal   : {sub:.2f}s over {len(common)} (missing: {sorted(missing) or 'none'})")
    print(f"vs r3 best-ever    : {sub / sum(ref['queries'].values()):.2f}x")
    print(f"vs r1 baseline 30.06s: {sub / 30.06:.2f}x")
    print(f"headline total     : {cur['value']}s over {len(cur['queries'])}")


if __name__ == "__main__":
    main()
