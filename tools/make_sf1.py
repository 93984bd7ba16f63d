"""Synthesize an sf1 bench directory from sf0.1 (k=10 key-offset
copies), for the full-vector 10x scale run BASELINE.md's r11 verdict
asked for.  No sf1 testdata exists and no generator is reachable
offline, so this applies the scale_smoke copy discipline to EVERY
fact table and writes ordinary parquet under /tmp/sf1:

- facts (orders, lineitem, customer, events, documents, embeddings)
  get k copies with CONSISTENT key strides (i * 100_000_000), so
  join fan-out per key is invariant and only row counts grow — the
  "more customers, more orders" axis real sf1 growth follows;
- dims (region, nation, part, supplier) stay fixed (the TPC-H
  nation/region contract; part/supplier fan-in grows k x, which is
  the conservative direction for the part/supplier joins);
- text is per-copy consonant-rotated and customer names per-copy
  prefixed, embeddings per-copy sign-flipped: exact cross-copy
  duplicates would plant k-cliques and make dedup/similarity/fuzzy
  outputs explode k^2 — that measures output growth, not operator
  scaling (the scale_smoke rationale, measured there);
- events.ts round-trips through Spark to ordinary TIMESTAMP (the
  TIMESTAMP(NANOS) special case applies only to the driver files;
  load_table handles both).

Usage: python tools/make_sf1.py [--vocab] [K] [OUT_DIR]
       (default 10 /tmp/sf1)

--vocab adds the VOCABULARY-GROWTH axis the default copy discipline
deliberately holds fixed: part/supplier keys stride per copy too
(p_partkey / s_suppkey / l_partkey / l_suppkey), so the co-purchase
and supply graphs grow copy-LOCAL structure (k x nodes, ~k x edges)
instead of densifying a fixed 20k-part vocabulary (the
link_scores_copurchase sf1 finding: 347x edge growth under fixed
vocabulary is input densification, not operator scaling).  This is
the axis real corpus growth follows for graph ops; key joins still
resolve (dim copies match fact strides).  region/nation stay fixed
always (TPC-H contract).
"""

from __future__ import annotations

import os
import random
import sys
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STRIDE = 100_000_000
ALPHA = "bcdfghjklm"


def main() -> int:
    argv = sys.argv[1:]
    vocab = False
    if argv and argv[0] == "--vocab":
        vocab = True
        argv = argv[1:]
    k = int(argv[0]) if len(argv) > 0 else 10
    out = argv[1] if len(argv) > 1 else "/tmp/sf1"

    from pyspark.sql import functions as F

    from bubbles_spark.io import load_table
    from bubbles_spark.session import get_spark

    spark = get_spark("make_sf1")

    def copies(df, key_cols, text_cols=(), name_prefix_col=None,
               emb_col=None):
        outs = []
        for i in range(k):
            c = df
            for col in key_cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * STRIDE))
            for col in text_cols:
                rot = ALPHA[i % len(ALPHA):] + ALPHA[: i % len(ALPHA)]
                c = c.withColumn(col, F.translate(col, ALPHA, rot))
            if name_prefix_col is not None and i > 0:
                # two-letter copy code repeated 3x: any two copies'
                # prefixes differ in >= 3 positions, so cross-copy
                # pairs stay beyond max_dist<=2 fuzzy joins at any k
                code = chr(65 + i // 26) + chr(65 + i % 26)
                c = c.withColumn(
                    name_prefix_col,
                    F.concat(F.lit(code * 3), F.col(name_prefix_col)),
                )
            if emb_col is not None and i > 0:
                rng = random.Random(7_654_321 + i)
                signs = [float(rng.choice((-1.0, 1.0))) for _ in range(64)]
                arr = F.array(*[F.lit(s) for s in signs])
                c = c.withColumn(
                    emb_col,
                    F.transform(
                        emb_col,
                        lambda x, j: (x * F.element_at(arr, j + 1)).cast(
                            "float"
                        ),
                    ),
                )
            outs.append(c)
        return reduce(lambda a, b: a.unionByName(b), outs)

    plans = {
        "region": lambda d: d,
        "nation": lambda d: d,
        "part": (lambda d: copies(d, ["p_partkey"])) if vocab
        else (lambda d: d),
        "supplier": (lambda d: copies(d, ["s_suppkey"])) if vocab
        else (lambda d: d),
        "customer": lambda d: copies(
            d, ["c_custkey"], name_prefix_col="c_name"
        ),
        "orders": lambda d: copies(d, ["o_orderkey", "o_custkey"]),
        "lineitem": (
            lambda d: copies(d, ["l_orderkey", "l_partkey", "l_suppkey"])
        ) if vocab else (lambda d: copies(d, ["l_orderkey"])),
        "events": lambda d: copies(d, ["event_id", "user_id"]),
        "documents": lambda d: copies(d, ["doc_id"], text_cols=("text",)),
        "embeddings": lambda d: copies(d, ["vec_id"], emb_col="embedding"),
    }
    os.makedirs(out, exist_ok=True)
    for name, plan in plans.items():
        df = plan(load_table(spark, SRC, name))
        path = os.path.join(out, f"{name}.parquet")
        # single parquet FILE per table — REQUIRED, not cosmetic: the
        # streaming source reads sf_dir with
        # pathGlobFilter='events.parquet', so a directory-of-parts
        # layout matches ZERO files and every stream query silently
        # runs on empty input (measured: 0.2s "timings")
        tmp = path + ".tmpdir"
        # bounded row groups (16 MB) inside the single file: a
        # coalesce(1) write otherwise emits ONE row group per table
        # (500k docs / 1.5M customers in a single split), capping
        # every map phase at ONE task regardless of local[32] — the
        # scale run then measures single-thread growth, not operator
        # scaling (the r13 twin of the r12 pathGlobFilter artifact).
        # sf1_bench.py pairs this with maxPartitionBytes=16m so read
        # parallelism grows with data, as real multi-file corpora do.
        df.coalesce(1).write.option(
            "parquet.block.size", 16 * 1024 * 1024
        ).mode("overwrite").parquet(tmp)
        import glob
        import shutil

        parts = sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))
        assert len(parts) == 1, parts
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)
        shutil.move(parts[0], path)
        shutil.rmtree(tmp)
        n = spark.read.parquet(path).count()
        print(f"# {name}: {n} rows -> {path}", file=sys.stderr)
    print(f"sf1 written to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
