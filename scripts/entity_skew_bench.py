"""Hot-code skew evidence for phonetic-blocking record linkage.

The real-world skew case for phonetic blocking is a common surname: m
A-records and m B-records share ONE code, so the block join emits m²
candidate pairs from a single key whose INPUT is only 2m small rows.
Claim under test (pipeline/entity.py::link_phonetic): AQE's skew-join
split cannot fix this — it detects skew by input partition BYTES; the
quadratic blow-up is in the join OUTPUT (the same finding
`scripts/lsh_skew_bench.py` measured for LSH bands). The fix is key
salting (``block_shards``), which spreads each hot code's m² work over
`shards` tasks by construction with shard-count-invariant output.

Workload: n records per side, HOT_FRAC of both sides carrying one
common surname (one shared code), the rest unique strings. Runs the
identical link_phonetic three ways, reports wall time + match counts:

  aqe_skew   — block_shards=1, AQE skew-join splitting ON (thresholds
               lowered so input-based splitting would trigger if it
               ever could)
  no_skew    — block_shards=1, skew splitting OFF (control: AQE made
               no difference = input-byte detection is output-blind)
  salted     — block_shards=8, skew splitting ON

Writes nothing outside /tmp. Usage: python scripts/entity_skew_bench.py [n]
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

    # unique names: id-derived letter soup (codes almost never collide);
    # hot rows: one common surname per side, phonetic twins of each other
    uniq = F.concat(
        F.lit("nm"),
        ((F.col("id") * 7919) % 99991).cast("string"),
        F.lit("qv"),
        ((F.col("id") * 104729) % 99991).cast("string"),
    )
    hot = F.col("id") % 100 < int(HOT_FRAC * 100)
    a = spark.range(n).select(
        F.col("id").alias("a_id"),
        F.when(hot, F.lit("smith")).otherwise(uniq).alias("an"),
    )
    b = spark.range(n).select(
        F.col("id").alias("b_id"),
        F.when(hot, F.lit("smyth")).otherwise(F.concat(uniq, F.lit("x"))).alias("bn"),
    )
    return a, b


def run_once(spark, a, b, shards: int, skew_on: bool) -> dict:
    from geomesa_hive_spark.pipeline.entity import link_phonetic

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ as at scale

    t0 = time.time()
    # max_block_size=None: this bench MEASURES the uncapped hot-block
    # spread (the behavior the round-11 default cap exists to avoid)
    matches, _dropped = link_phonetic(
        a, b, "a_id", "an", "b_id", "bn", max_dist=2, block_shards=shards,
        max_block_size=None,
    )
    n_links = matches.count()
    wall = round(time.time() - t0, 2)
    spark.catalog.clearCache()
    return {"links": n_links, "wall_s": wall}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("entity-skew-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    a, b = build(spark, n)
    a, b = a.cache(), b.cache()
    a.count(), b.count()

    run_once(spark, a, b, 1, False)  # untimed warmup

    out = {"n_per_side": n, "hot_frac": HOT_FRAC}
    for name, shards, skew in [
        ("aqe_skew", 1, True),
        ("no_skew", 1, False),
        ("salted", 8, True),
    ]:
        out[name] = run_once(spark, a, b, shards, skew)
        print(f"# {name}: {out[name]}", file=sys.stderr)
    same = out["aqe_skew"]["links"] == out["no_skew"]["links"] == out["salted"]["links"]
    out["links_identical"] = same
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
