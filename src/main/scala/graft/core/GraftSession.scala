package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the confs this engine assumes everywhere.
  *
  * Local mode is for correctness testing only; the confs are chosen so the
  * same logical plans scale to a real cluster: AQE on (runtime re-plan,
  * skew-join splitting), dynamic partition overwrite (idempotent
  * per-partition rewrites mirroring the reference's `overwrite_partitions`
  * semantics, reference `data_cleaner/pnp-cleanerLambda.py:116`), UTC.
  */
object GraftSession {
  def local(appName: String = "graft", cores: Int = defaultCores): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // runtime skew-join splitting: oversized partitions of a shuffle join
      // are split into subtasks (salting's join-side sibling; aggregation
      // skew is handled explicitly via graft.functions.Skew)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def defaultCores: Int =
    math.min(Runtime.getRuntime.availableProcessors(), 32)

  /** Tune an externally-provided session (driver-owned in Verify/Bench). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark
  }
}
