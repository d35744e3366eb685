package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Sampling

/** Training-shard EXPORT — the terminal sink of the corpus pipeline: the
  * t8 token-budget shard assignment materialized as one directory per
  * shard of compressed JSONL, the layout a training loader consumes
  * (read shard k = read one directory; a shard's token mass is bounded
  * by construction).
  *
  * Scale contract:
  *  - the shard assignment is the t8 two-level prefix sum (no global
  *    single-partition window);
  *  - `partitionBy(shard_id)` writes every shard directory in one pass —
  *    the single shuffle is the repartition on shard_id that maps each
  *    shard to one task (without it, every task holds files for every
  *    shard: a small-files explosion at corpus scale);
  *  - `maxRecordsPerFile` bounds any one file regardless of skew, so a
  *    pathological shard splits instead of producing a multi-GB file;
  *  - dynamic partition overwrite (session-wide in [[graft.core
  *    .GraftSession]], set per-write here for standalone use) makes
  *    re-export of a re-curated corpus rewrite only the touched shards —
  *    same idempotence contract as the clean zone (K4).
  */
object ExportJob {

  /** Cap on records per output file. The fixture corpus is tiny; the cap
    * exists to pin the mechanism — production sets it from target file
    * size / mean record size.
    */
  val MaxRecordsPerFile = 200L

  /** Join the shard assignment back to the document payload and write
    * `outDir/shard_id=<k>/part-*.json.gz`. Returns the exported frame
    * (shard_id, doc_id, text, lang, source) for callers that chain.
    */
  def writeTrainingShards(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    val shards = Sampling.tokenShards(spark, dir)
      .select("doc_id", "shard_id", "n_tokens")
    val docs = graft.core.Tables(spark, dir).documents
      .select("doc_id", "text", "lang", "source")
    val export = shards.join(docs, "doc_id")
      .select("shard_id", "doc_id", "text", "lang", "source")
    export
      // one task per shard directory; AQE splits a skewed shard's task
      .repartition(col("shard_id"))
      .sortWithinPartitions("doc_id") // deterministic record order per file
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", MaxRecordsPerFile)
      .option("compression", "gzip")
      .partitionBy("shard_id")
      .json(outDir)
    export
  }
}
