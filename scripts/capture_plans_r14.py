"""Capture .explain("formatted") for headline queries into plans/r14/.

Usage: python scripts/capture_plans_r13.py <suffix> [query ...]
  suffix: "before" or "after" — file name becomes plans/r14/<query>_<suffix>.txt
  With no query list, captures every bench.py HEADLINE query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from bench import HEADLINE, _sf_dir  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir, _ = _sf_dir()

    from pwc_challenge_dataengineer_spark.plans.catalog import QUERIES
    from pwc_challenge_dataengineer_spark.session import get_spark

    spark = get_spark("capture-plans")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        # quick shape summary to stderr
        ex = plan.count("Exchange")
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        shj = plan.count("ShuffledHashJoin")
        pyn = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("MapInArrow") + plan.count("ArrowEvalPython")
        print(f"# {name}: Exchange={ex} BHJ={bhj} SMJ={smj} SHJ={shj} Py={pyn}", file=sys.stderr)
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
