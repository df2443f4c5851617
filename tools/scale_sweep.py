"""Full-registry scale sweep: run EVERY __spark_entry__.queries() entry
at a given SF (default sf0.1) in one session, timing each, and flag
outliers. The per-query bench covers 27 representative headliners; this
sweep is the net that catches accidental quadratics and session-level
failures the bench misses — it found the 1 GB default driver heap OOM,
the countDistinct×percentile_approx Expand pathology (151 s), and the
Generate-pushdown shingle re-inline (21 s) in round 3.

    python tools/scale_sweep.py [sf_dir] [slow_threshold_sec]

Exit code 1 if any query errors or exceeds the threshold (default 30 s).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from mongo_cdc_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    slow = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
    spark = get_spark("scale_sweep")
    spark.range(1000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            times[name] = round(time.time() - t0, 2)
            print(f"{name} {times[name]}s", flush=True)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            errors[name] = f"{type(exc).__name__}: {str(exc)[:200]}"
            print(f"{name} ERROR {errors[name]}", flush=True)

    print("\n== slowest ==")
    for k, v in sorted(times.items(), key=lambda x: -x[1])[:10]:
        print(f"{k} {v}s")
    over = {k: v for k, v in times.items() if v > slow}
    print(f"\n== total == {round(sum(times.values()), 1)}s "
          f"over {len(times)} queries")
    if errors:
        print(f"== errors == {errors}")
    if over:
        print(f"== over {slow}s == {over}")
    return 1 if (errors or over) else 0


if __name__ == "__main__":
    sys.exit(main())
