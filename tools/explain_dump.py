"""Dump .explain("formatted") for bench HEADLINE labels.

Writes plans/$PLANS_ROUND/<label>_<tag>.txt (default r13) for each
requested label — the
optimization-round evidence artifact: the judge cannot run Spark, so
plan claims ("2 Exchange -> 1", "SortMergeJoin -> BroadcastHashJoin")
are checked against these files.

    python tools/explain_dump.py <tag> [sf_dir] label1 label2 ...
    python tools/explain_dump.py before sf0.1 binseg hits

Tag is normally "before" or "after". Uses the same session factory as
bench.py so the captured plan is the plan the bench times (AQE initial
plan: isFinalPlan=false is expected).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    args = sys.argv[1:]
    if len(args) < 2:
        print("usage: explain_dump.py <tag> [sf_dir] label ...",
              file=sys.stderr)
        sys.exit(2)
    tag = args.pop(0)
    sf_dir = "/root/testdata/sf0.1"
    # only treat the token as a data dir when it is a PATH or exactly
    # an sf name (sf0.1, sf0.001, ...): a bare startswith("sf") match
    # used to eat any bench label beginning with "sf" (ADVICE r12)
    import re
    if args and (os.sep in args[0] or re.fullmatch(r"sf[0-9.]+", args[0])):
        sf_dir = args.pop(0)
        if os.sep not in sf_dir:
            sf_dir = f"/root/testdata/{sf_dir}"

    import bench
    from mongo_cdc_spark.session import get_spark

    by_label = dict(bench.HEADLINE)
    unknown = [a for a in args if a not in by_label]
    if unknown:
        print(f"unknown labels: {unknown}", file=sys.stderr)
        sys.exit(2)

    out_dir = REPO / "plans" / os.environ.get("PLANS_ROUND", "r13")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("explain_dump")
    for name in args:
        df = by_label[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = out_dir / f"{name}_{tag}.txt"
        path.write_text(plan)
        n_ex = plan.count("Exchange")
        joins = sorted({w for w in (
            "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
            "BroadcastNestedLoopJoin", "CartesianProduct") if w in plan})
        py = sorted({w for w in (
            "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
            "MapInArrow", "FlatMapGroupsInPandas") if w in plan})
        print(f"{name}: Exchange={n_ex} joins={joins} python={py} "
              f"-> {path.relative_to(REPO)}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
