package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's synthetic star schema (TESTDATA.md).
  *
  * Each accessor is a fresh parquet scan — Catalyst prunes columns and pushes
  * predicates into the scan, so "load the table" costs only what the query
  * actually reads. At 100 TB these would be catalog tables; the query code is
  * identical either way.
  */
object Tables {
  /** Round-robin spread of a NARROW projection across every core, for use
    * directly before CPU-heavy per-row work (per-shingle hashing, token
    * explodes). A small parquet file scans as ONE input split, so without
    * this the expensive projection runs single-threaded until the first
    * shuffle — measured 30x under-parallelization on the dedup family.
    * Scale note: this is the splits < cores remedy (small files, or heavy
    * pushdown filters collapsing the scan); the shuffled payload is only
    * the columns the stage consumes, and when the input already arrives in
    * thousands of splits the exchange is a cheap no-op rebalance — or can
    * be dropped entirely.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}

final case class Tables(spark: SparkSession, dir: String) {
  // Set once at construction (not inside an accessor) so query plans never
  // depend on accessor call order: the events parquet carries
  // TIMESTAMP(NANOS), readable in Spark 4 only via this legacy conf.
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")
  /** The events table carries TIMESTAMP(NANOS) parquet (read as Long via the
    * constructor-set legacy conf); normalize back to TimestampType
    * (microsecond precision) so downstream time logic is uniform.
    */
  def events: DataFrame = {
    val raw = table("events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
