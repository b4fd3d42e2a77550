"""Hot-band skew evidence for the minhash-LSH band join.

The real-world skew case for banded LSH is boilerplate text: m
near-identical documents share every band hash, so the band self-join
materializes m²/2 candidate pairs from ONE (band, hash) key. Claim
under test (pipeline/dedup.py::minhash_lsh_pairs): AQE's skew-join
split can NOT fix this — it detects skew by input partition BYTES, and
the hot bucket's input is only m small rows; the quadratic blow-up is
in the join OUTPUT. The fix is key salting (``band_shards``), which
spreads each hot bucket's m² work over `shards` tasks by construction.

Workload: N docs, HOT_FRAC of them sharing one boilerplate text (all
16 bands collide), the rest unique. Runs the identical
minhash_lsh_pairs three ways and reports wall time and pair counts:

  aqe_skew   — band_shards=1, AQE skew-join splitting ON (thresholds
               lowered so input-based splitting would trigger if it
               ever could)
  no_skew    — band_shards=1, skew splitting OFF (control: shows AQE
               made no difference, i.e. input-byte detection is blind
               to output skew)
  salted     — band_shards=8, skew splitting ON

Writes nothing outside /tmp. Usage: python scripts/lsh_skew_bench.py [n_docs]
"""
from __future__ import annotations

import json
import sys
import time

ROOT = "/root/repo"
sys.path.insert(0, ROOT)

HOT_FRAC = 0.10


def build(spark, n: int):
    from pyspark.sql import functions as F

    boiler = (
        "this document is provided as is without warranty of any kind either "
        "express or implied including but not limited to the implied warranties "
        "of merchantability and fitness for a particular purpose"
    )
    # unique docs: id-derived word soup, no shared 3-grams with the boilerplate
    uniq = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{j}x"), ((F.col("id") * (7919 + j * 104729)) % 99991).cast("string"))
            for j in range(30)
        ],
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 100 < int(HOT_FRAC * 100), F.lit(boiler))
        .otherwise(uniq)
        .alias("text"),
    )


def run_once(spark, docs, shards: int, skew_on: bool) -> dict:
    from geomesa_hive_spark.pipeline.dedup import minhash_lsh_pairs

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    # lower the input-size thresholds far below the data so input-based
    # splitting triggers if it ever can
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ as at scale

    t0 = time.time()
    n_pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_perm=64, bands=16, threshold=0.5,
        band_shards=shards,
    ).count()
    wall = round(time.time() - t0, 2)
    spark.catalog.clearCache()
    return {"pairs": n_pairs, "wall_s": wall}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("lsh-skew-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = build(spark, n).cache()
    docs.count()

    run_once(spark, docs, 1, False)  # untimed warmup: workers, codegen, page cache

    out = {"n_docs": n, "hot_frac": HOT_FRAC}
    for name, shards, skew in [
        ("aqe_skew", 1, True),
        ("no_skew", 1, False),
        ("salted", 8, True),
    ]:
        out[name] = run_once(spark, docs, shards, skew)
        print(f"# {name}: {out[name]}", file=sys.stderr)
    same = out["aqe_skew"]["pairs"] == out["no_skew"]["pairs"] == out["salted"]["pairs"]
    out["pairs_identical"] = same
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
