"""Dump .explain("formatted") for catalog queries to plans/<dir>/<name>_<tag>.txt.

Usage: python tools/dump_plan.py <out_dir> <tag> <query> [<query> ...]

The judge-facing plan evidence for optimization rounds (guide §1.1/§7.2):
run once before a change (tag=before) and once after (tag=after).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    out_dir, tag, *names = sys.argv[1:]
    from hive_udf_neologd_spark.catalog import QUERIES
    from hive_udf_neologd_spark.session import get_spark

    spark = get_spark("dump-plan", cpus=8)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
