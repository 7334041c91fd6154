package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] takes `(spark, sfDir)` and reads
  * only these tables, so the DuckDB oracle can run the equivalent SQL
  * against the same files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread a narrow scan across the session's cores (guide §2.5, input
    * skew): the testdata tables ship as ONE file with ONE row group, so
    * every scan plans a single task and all per-row compute downstream
    * of it serializes on one core of N. When the plan has fewer
    * partitions than the default parallelism, pay one round-robin
    * exchange of the (column-pruned) rows to unlock N-way compute; on a
    * production-scale input (many splits) this is a no-op, so the knob
    * is data-derived, not tuned to local mode. Only safe where row
    * order doesn't reach the result — every caller ends in aggregation
    * or a total-order sort. */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** [[spread]] keyed by the downstream grouping columns: hash-
    * repartitions to exactly `defaultParallelism` partitions so the
    * exchange both unlocks full-width compute AND satisfies every
    * downstream aggregation clustered on a subset of `keys` (no further
    * exchange). The explicit partition count matters: a keyed
    * repartition without one is an AQE-coalescible shuffle, and on a
    * few-MB CPU-heavy stage AQE's byte-targeted coalescing collapses it
    * back to one or two tasks — the exact serialization being removed.
    * Same scale guard as [[spread]]: a many-split production scan passes
    * through untouched. */
  def spreadBy(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, keys: _*) else df
  }
}
