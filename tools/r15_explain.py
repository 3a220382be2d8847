"""Capture .explain('formatted') for a list of registry queries.

Usage: python tools/r15_explain.py <out_dir> <suffix> <query> [<query> ...]
Run with cwd/sys.path pointing at the code arm you want to capture
(e.g. the clean HEAD worktree for *_before.txt, the working tree for
*_after.txt). Plans that execute builder jobs during frame construction
(collect-seeded trainers) are fine — explain itself adds nothing.
"""

import os
import sys

sys.path.insert(0, os.getcwd())

from analyzing_big_data_in_scala_spark.plans.registry import QUERIES  # noqa: E402
from analyzing_big_data_in_scala_spark.session import get_spark  # noqa: E402
import analyzing_big_data_in_scala_spark.plans  # noqa: F401,E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r15-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path)


if __name__ == "__main__":
    main()
