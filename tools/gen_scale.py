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


def _hira(kata: str) -> str:
    return "".join(
        chr(ord(c) - 0x60) if "ァ" <= c <= "ヶ" else c for c in kata
    )


def neologd_shaped_csv_rows(n_compounds: int = 960_000) -> list[str]:
    """Emit >1M synthetic dictionary rows AS MeCab-format CSV TEXT — the
    full-fidelity twin of tests/test_dictionary_scale.py's
    ``realistic_entries`` fixture (VERDICT r10 #2: the r8 1M gate proved
    scale on in-memory DictEntry lists with ``*`` readings; this one
    proves the actual ingest seam, ``load_mecab_csv`` alone, on rows that
    carry column-11 readings and NEologd norm-carrying base forms the way
    a real mecab-ipadic-neologd CSV does).

    Three NEologd-shaped populations, derived deterministically from the
    packaged snapshot (Knuth multiplicative spread, no RNG), each
    output-neutral by construction (the same cost arguments as the r8
    fixture, gated externally by the six-axis dress rehearsal):

    * prefix-sharing compounds at cost sum(parts)+100/+200 — WITH a
      concatenated column-11 reading when every part carries one (IPADIC
      compound rows carry full readings, e.g. 東京都 トウキョウト);
    * kana variants whose BASE-FORM COLUMN carries the canonical surface
      — the exact encoding NEologd uses for surface normalization
      (中居正広のミになる図書館 → 身になる: reference
      KuromojiNEologdUDFTest.java:213-236) — at cost max(+100, 1650) so
      they enter the lattice everywhere but win only where no cheaper
      real path exists;
    * homograph stacks (+200 / +400 名詞-固有名詞) deepening buckets.
    """
    from hive_udf_neologd_spark.tokenizer.dictionary import snapshot_entries

    knuth = 2654435761
    base = list(snapshot_entries())
    nouns = [
        e for e in base
        if e.pos.startswith("名詞") and 2 <= len(e.surface) <= 8
    ]
    n = len(nouns)

    def line(surface, pos4, cost, base_col="*", reading="*"):
        p = (pos4.split("-") + ["*", "*", "*"])[:4]
        return (
            f"{surface},0,0,{cost},{p[0]},{p[1]},{p[2]},{p[3]},*,*,"
            f"{base_col},{reading},*"
        )

    rows: list[str] = []
    for i in range(n_compounds):
        a = nouns[(i * knuth) % n]
        b = nouns[((i * i) ^ (i >> 5)) % n]
        if i % 5 == 0:
            c = nouns[(i * 97 + 29) % n]
            surf = a.surface + b.surface + c.surface
            cost = a.cost + b.cost + c.cost + 200
            reading = (
                a.reading + b.reading + c.reading
                if a.reading and b.reading and c.reading else "*"
            )
        else:
            surf = a.surface + b.surface
            cost = a.cost + b.cost + 100
            reading = (
                a.reading + b.reading if a.reading and b.reading else "*"
            )
        rows.append(line(surf, "名詞-一般", cost, "*", reading))
    for e in base:
        if e.reading and len(e.reading) >= 3 and e.pos.startswith("名詞"):
            h = _hira(e.reading)
            if h != e.surface:
                # norm-carrying: base-form column = canonical surface.
                rows.append(
                    line(h, e.pos, max(e.cost + 100, 1650),
                         e.surface, e.reading)
                )
    for i in range(0, n, 3):
        e = nouns[i]
        rd = e.reading or "*"
        rows.append(line(e.surface, e.pos, e.cost + 200, "*", rd))
        rows.append(line(e.surface, "名詞-固有名詞-一般", e.cost + 400,
                         "*", rd))
    return rows


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--dict-csv":
        out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/neologd_shaped_1m.csv"
        rows = neologd_shaped_csv_rows()
        with open(out_path, "w", encoding="utf-8", newline="\n") as f:
            f.write("\n".join(rows) + "\n")
        print(f"wrote {len(rows)} NEologd-shaped rows to {out_path}")
        sys.exit(0)
    sys.exit(main())
