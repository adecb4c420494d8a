"""Salted two-phase aggregation: equivalence with plain groupBy on skewed
data, deterministic salts, fan-out behavior."""

from pyspark.sql import functions as F

from graphiti_spark.operators import skew


def _skewed(spark, n_hot=5000, n_tail=50):
    hot = spark.range(n_hot).select(
        F.lit("HOT").alias("k"), F.concat(F.lit("h"), "id").alias("row_id"),
        (F.col("id") % 7).alias("v"))
    tail = spark.range(n_tail).select(
        F.concat(F.lit("k"), "id").alias("k"),
        F.concat(F.lit("t"), "id").alias("row_id"),
        (F.col("id") % 7).alias("v"))
    return hot.unionByName(tail)


def test_salted_count_equals_plain_count(spark):
    df = _skewed(spark)
    want = {(r["k"], r["count"])
            for r in df.groupBy("k").count().collect()}
    got = {(r["k"], r["cnt"])
           for r in skew.salted_count(df, ["k"], "row_id").collect()}
    assert got == want


def test_two_phase_sum_min_max(spark):
    df = _skewed(spark)
    got = {r["k"]: (r["s"], r["mn"], r["mx"]) for r in skew.two_phase_agg(
        df, ["k"], "row_id",
        [F.sum("v").alias("_s"), F.min("v").alias("_mn"),
         F.max("v").alias("_mx")],
        [F.sum("_s").alias("s"), F.min("_mn").alias("mn"),
         F.max("_mx").alias("mx")]).collect()}
    want = {r["k"]: (r["s"], r["mn"], r["mx"]) for r in
            df.groupBy("k").agg(F.sum("v").alias("s"), F.min("v").alias("mn"),
                                F.max("v").alias("mx")).collect()}
    assert got == want


def test_salt_deterministic_and_spreads_hot_key(spark):
    df = _skewed(spark)
    s1 = skew.salted(df, "row_id").where(F.col("k") == "HOT")
    n_salts = s1.select("_salt").distinct().count()
    assert n_salts == skew.DEFAULT_SALT      # hot key fans out over buckets
    a = {tuple(r) for r in s1.select("row_id", "_salt").collect()}
    b = {tuple(r) for r in skew.salted(df.repartition(13), "row_id")
         .where(F.col("k") == "HOT").select("row_id", "_salt").collect()}
    assert a == b                            # salt is content-derived
