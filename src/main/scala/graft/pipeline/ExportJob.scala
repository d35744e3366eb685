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
  *    the single shuffle is the REBALANCE on shard_id that co-locates a
  *    shard's rows (without it, every task holds files for every shard: a
  *    small-files explosion at corpus scale). A rebalance, not a plain
  *    repartition, because AQE's skew splitting applies only to rebalance
  *    partitions — a pathological shard splits across tasks (still one
  *    DIRECTORY via partitionBy) instead of serializing on one task;
  *  - `maxRecordsPerFile` bounds any one file regardless of skew, so a
  *    heavy task splits output files instead of producing a multi-GB one;
  *  - re-export is a FULL overwrite of the zone, deliberately NOT the
  *    clean zone's per-partition dynamic overwrite (K4): K4's partition
  *    values are stable natural keys, but shard_id is a dense prefix-sum
  *    artifact — re-curating the corpus shifts every downstream
  *    assignment and can shrink the shard count, and a per-partition
  *    overwrite would leave the trailing stale shard directories in
  *    place (duplicate training data). Truncate-and-replace is the only
  *    assignment-stable contract; it stays idempotent. A deployment that
  *    needs INCREMENTAL re-export should shard by a stable content key
  *    instead (t7's salted hash mod N — assignments never shift), trading
  *    the strict per-shard token bound for per-partition overwrite.
  */
object ExportJob {

  /** Cap on records per output file — below the fixture's largest shard
    * (95 rows at sf0.001) so the spec actually exercises the file split;
    * production sets it from target file size / mean record size.
    */
  val MaxRecordsPerFile = 50L

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
      // co-locate each shard; AQE may split a skewed shard across tasks
      .hint("rebalance", col("shard_id"))
      // shard_id first: the file writer requires its partition column sorted
      // and would otherwise insert its own (unstable) sort, scrambling doc_id
      .sortWithinPartitions("shard_id", "doc_id")
      .write
      .mode(SaveMode.Overwrite)
      // pin truncate-and-replace even under a session-wide dynamic default
      .option("partitionOverwriteMode", "static")
      .option("maxRecordsPerFile", MaxRecordsPerFile)
      .option("compression", "gzip")
      .partitionBy("shard_id")
      .json(outDir)
    export
  }
}
