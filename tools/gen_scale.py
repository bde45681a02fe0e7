"""Generate an sf1-scale benchmark dataset by replicating sf0.1 ×10.

PURPOSE (VERDICT r4 next-round #4): one order-of-magnitude datapoint to
make the repo's scaling claims empirical — bench.py runs against the
output and SCALING.md records per-query sf0.1→sf1 ratios.  This is BENCH
data only: the driver's correctness harness still runs exclusively
against the read-only driver-generated sf0.01.

Replication scheme (replica r ∈ 0..9, all shifts deterministic):

* every key column shifts by ``r × OFFSET_column`` where the offset is a
  power of ten above the column's max — cross-table join structure
  (orders↔lineitem↔customer, part/supplier FKs) is preserved exactly,
  and key-derived modular patterns (ANN query/centroid sets) keep the
  same densities;
* fixed dimensions (region, nation) are NOT replicated — at real scale
  dimension tables do not grow with the fact tables;
* ``documents.text``: every 5th token gets a replica-tag suffix, so a
  replica is NOT a near-duplicate of its original (Jaccard over
  3-shingles drops to ≈0.25) — otherwise every natural dup cluster
  would grow 10× in SIZE (quadratic pair blowup), which is not how
  duplicate rate behaves in a real 10× corpus (cluster COUNT grows,
  size does not);
* ``embeddings.embedding``: dimensions circularly rotated by r — norms
  and per-dim distributions preserved, cross-replica cosine ≈ random,
  same reasoning as documents.

Usage:  python tools/gen_scale.py [out_dir] [replicas]
        (defaults: /root/repo/.scratch/sf1, 10)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

KEY_COLS = {
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# One shared offset per logical key, consistent across tables.
KEY_FAMILY = {
    "s_suppkey": "supp", "l_suppkey": "supp",
    "p_partkey": "part", "l_partkey": "part",
    "c_custkey": "cust", "o_custkey": "cust",
    "o_orderkey": "ord", "l_orderkey": "ord",
    "event_id": "event", "user_id": "user",
    "doc_id": "doc", "vec_id": "vec",
}


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from pyspark.sql import functions as F

    from hive_udf_neologd_spark.session import get_spark

    spark = get_spark("gen-scale")

    # Pass 1: per-family offsets (power of ten above the family max).
    fam_max: dict[str, int] = {}
    tables = {}
    for t, keys in KEY_COLS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        tables[t] = df
        for k in keys:
            fam = KEY_FAMILY[k]
            mx = df.agg(F.max(k)).first()[0]
            fam_max[fam] = max(fam_max.get(fam, 0), int(mx))
    offset = {f: 10 ** (int(math.log10(m)) + 1) for f, m in fam_max.items()}
    print("offsets:", offset)

    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )

    emb_dim = 64
    for t, keys in KEY_COLS.items():
        df = tables[t]
        parts = []
        for r in range(replicas):
            rep = df
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(r * offset[KEY_FAMILY[k]]))
            if t == "documents" and r > 0:
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.expr(
                            f"transform(split(text, ' '), (w, i) -> "
                            f"IF(i % 5 = 0, concat(w, 'zz{r}'), w))"
                        ),
                        " ",
                    ),
                )
            if t == "embeddings" and r > 0:
                rep = rep.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(sequence(0, {emb_dim - 1}), "
                        f"i -> embedding[(i + {r}) % {emb_dim}])"
                    ),
                )
            parts.append(rep)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(32).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"{t}: {replicas}x written")
    print(f"done -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
