"""Dynamic partition pruning: a date-partitioned fact joined to a
filtered dimension must scan only the partitions the dim filter selects
— the 100 TB pattern behind the reference's daily index rollover
(es.go:78-116): query "last week" and the engine reads 7 partitions,
not the year.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t


def test_dim_filter_prunes_fact_partitions(spark, tmp_path, sf_dir):
    fact_path = str(tmp_path / "fact_by_day")
    ev = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    ev.write.partitionBy("day").mode("overwrite").parquet(fact_path)

    fact = spark.read.parquet(fact_path)
    n_days = fact.select("day").distinct().count()
    dim = fact.select("day").distinct().filter(F.col("day") <= "2024-01-03")
    n_sel = dim.count()
    assert 0 < n_sel < n_days

    joined = fact.join(dim.hint("broadcast"), "day")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # DPP inserts a dynamic pruning predicate on the fact scan
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    # and the result only contains the selected days
    got_days = {r["day"] for r in joined.select("day").distinct().collect()}
    assert len(got_days) == n_sel
