"""Capture `.explain("formatted")` for named registry queries into
plans/r14/<query>_<tag>.txt (the r14 optimization round's before/after
plan evidence — the judge checks plan claims against these files).

    python tools/plan_capture.py <tag> name1,name2,... [sf_dir]

`tag` is typically `before` or `after`. Building a query's DataFrame can
execute its eager localCheckpoints (index builds, iterative loops), so
plans reflect the frame the query RETURNS; that is exactly the frame the
bench times and the driver checks.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyzing_big_data_in_scala_spark.plans.registry import QUERIES  # noqa: E402
from analyzing_big_data_in_scala_spark.session import get_spark  # noqa: E402
import analyzing_big_data_in_scala_spark.plans  # noqa: F401,E402


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exch = plan.count("Exchange hashpartitioning")
        n_bexch = plan.count("BroadcastExchange")
        n_smj = plan.count("SortMergeJoin")
        n_bhj = plan.count("BroadcastHashJoin")
        n_shj = plan.count("ShuffledHashJoin")
        n_py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("MapInArrow")
        print(
            f"{name}: exch={n_exch} bcast={n_bexch} smj={n_smj} bhj={n_bhj} "
            f"shj={n_shj} python={n_py} -> {path}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
