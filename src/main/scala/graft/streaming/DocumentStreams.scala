package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming document ingestion + exact dedup (§2.10-plus): the batch
  * exact-dedup operator (graft.queries.Dedup d1) as a Structured Streaming
  * stateful aggregation, for corpora that ARRIVE continuously — the shape a
  * training-data pipeline actually runs (crawl output lands in files; the
  * dedup ledger must absorb each batch incrementally, not rescan the corpus).
  *
  * Scale design: the digest is computed BEFORE the stateful aggregation, so
  * neither the shuffle nor the state store ever holds document text — state
  * is one (16-byte digest → two longs) entry per DISTINCT document, the same
  * working set the batch groupBy's shuffle carries. That state is inherently
  * unbounded for global exact dedup (a new distinct doc can always arrive);
  * when the product only needs dedup within a time horizon,
  * `dropDuplicatesWithinWatermark` on the same digest column is the bounded
  * variant — this operator keeps global semantics so it can share d1's
  * oracle.
  */
object DocumentStreams {

  /** documents.parquet read schema (TESTDATA.md). */
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Replay a documents parquet zone as a stream. Same knobs as
    * [[EventStreams.readEvents]]: the glob selects the table out of the
    * shared sf dir, `maxFilesPerTrigger` forces multi-batch replay in specs.
    */
  def readDocuments(spark: SparkSession, dir: String,
      glob: String = "documents.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(docSchema)
      .option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

  /** Streaming twin of d1: running (keep_doc_id, n_copies) per content
    * digest. Update mode emits a group's refreshed row each micro-batch that
    * touches it; both outputs are MONOTONE (min only falls, count only
    * rises), so collapsing the update log to the final ledger is a plain
    * min/max per digest — no version column needed (contrast the
    * session/attribution streams, whose outputs are not componentwise
    * monotone and carry an explicit `ver`).
    */
  def dedupGroups(docs: DataFrame): DataFrame =
    docs
      .select(md5(col("text")).as("text_md5"), col("doc_id"))
      .groupBy("text_md5")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
}
