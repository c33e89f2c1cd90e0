"""Dev loop: run every registered query against the DuckDB oracle.

Usage: python scripts/check_oracle.py [--strict] [--vanilla] [sf_dir] [name_filter...]

``--strict`` reproduces the driver's tolerance-free value hash (float repr
equality instead of rel_tol=1e-6) — run the full corpus in strict mode at
sf0.01 AND sf0.1 at least once per round to flush round(float) last-digit
ties before the driver samples them.

``--vanilla`` runs under a PLAIN SparkSession (no solspark config profile,
no Arrow toggle) — the driver-simulation mode that catches
config-dependent output bugs (Arrow list rendering, nanos-timestamp
fallback). The round-8 session-B vanilla sweep covered all 545 queries
with 0 failures; keep that cadence once per round.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from sol_spark.oracle import compare
from sol_spark.registry import all_queries
from sol_spark.session import get_session


def main() -> int:
    argv = [a for a in sys.argv[1:] if a not in ("--strict", "--vanilla")]
    exact = "--strict" in sys.argv[1:]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    name_filters = argv[1:]
    if vanilla:
        from pyspark.sql import SparkSession

        # getActiveSession() is thread-local; a session created on another
        # thread (registered only process-wide) would still be reused by
        # getOrCreate() — check the process-wide slot too (pyspark has no
        # public getDefaultSession; _instantiatedSession is that slot).
        default = getattr(SparkSession, "_instantiatedSession", None)
        if SparkSession.getActiveSession() is not None or default is not None:
            # getOrCreate() would silently return the pre-existing
            # (solspark-configured) session, defeating the plain-session
            # driver simulation — fail loud instead.
            raise RuntimeError(
                "--vanilla requires a fresh process: a SparkSession is "
                "already active/default and getOrCreate() would reuse its config"
            )
        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_session("check_oracle")
    specs = all_queries()
    failures = []
    for name, spec in sorted(specs.items()):
        if name_filters and not any(f in name for f in name_filters):
            continue
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                print(f"  {name:35s} rows-only: {n} rows [{time.time()-t0:.1f}s]")
                continue
            ok, msg = compare(df, spec.oracle, sf_dir, exact=exact)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {str(e)[:300]}"
        status = "PASS" if ok else "FAIL"
        print(f"  {name:35s} {status}: {msg} [{time.time()-t0:.1f}s]")
        if not ok:
            failures.append((name, msg))
    print(f"\n{len(failures)} failures / {len(specs)} queries")
    for name, msg in failures:
        print(f"  FAIL {name}: {msg[:200]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
