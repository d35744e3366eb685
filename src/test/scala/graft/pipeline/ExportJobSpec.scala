package graft.pipeline

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The training-shard export sink: layout, round-trip fidelity, file-size
  * bounding, and idempotent re-export.
  */
class ExportJobSpec extends SparkTestBase {

  private val Sf = "/root/testdata/sf0.001"

  test("export writes one directory per shard, round-trips, and bounds files") {
    val out = scratch("export-shards")
    val exported = ExportJob.writeTrainingShards(spark, Sf, out).collect()

    // layout: exactly the assigned shard ids appear as partition dirs
    val dirs = new File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard_id=")).sorted
    val expectShards = exported.map(_.getAs[Long]("shard_id")).distinct.sorted
    assert(dirs.toSeq === expectShards.map(k => s"shard_id=$k").toSeq)

    // every file is gzip JSONL and none exceeds the record cap
    val files = new File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".json.gz"))
    assert(files.nonEmpty)

    // round-trip: reading the export back equals the exported frame
    // partition-dir values infer as int; normalize to the written type
    val back = spark.read.json(out)
      .select(col("shard_id").cast("long"), col("doc_id"), col("text"),
        col("lang"), col("source")).collect()
      .map(r => (r.getAs[Long]("shard_id"), r.getAs[Long]("doc_id"),
        r.getAs[String]("text"), r.getAs[String]("lang"), r.getAs[String]("source")))
      .sortBy(r => (r._1, r._2))
    val sent = exported
      .map(r => (r.getAs[Long]("shard_id"), r.getAs[Long]("doc_id"),
        r.getAs[String]("text"), r.getAs[String]("lang"), r.getAs[String]("source")))
      .sortBy(r => (r._1, r._2))
    assert(back.toSeq === sent.toSeq)
    back.groupBy(_._1).foreach { case (k, rows) =>
      val nFiles = new File(out, s"shard_id=$k").listFiles()
        .count(_.getName.endsWith(".json.gz"))
      assert(rows.length <= nFiles * ExportJob.MaxRecordsPerFile,
        s"shard $k: ${rows.length} rows in $nFiles files")
    }
    // the record cap actually bit: some shard is over it and split files
    assert(back.groupBy(_._1).values
      .exists(_.length > ExportJob.MaxRecordsPerFile),
      "fixture never exceeds MaxRecordsPerFile — the bound is untested")
    assert(files.length > dirs.length, "no shard split into multiple files")

    // idempotence: a second export over the same corpus leaves the same rows
    ExportJob.writeTrainingShards(spark, Sf, out)
    val again = spark.read.json(out).agg(count(lit(1)), sum("doc_id")).collect()(0)
    val first = (sent.length.toLong, sent.map(_._2).sum)
    assert((again.getLong(0), again.getLong(1)) === first)
  }

  test("re-export of a shrunk corpus leaves no stale shard directories") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val big = scratch("export-corpus-big")
    val small = scratch("export-corpus-small")
    docs.write.mode("overwrite").parquet(s"$big/documents.parquet")
    // curation dropped 60% of the corpus: every shard assignment shifts
    // and the shard count falls
    docs.filter(col("doc_id") % 5 < 2).write.mode("overwrite")
      .parquet(s"$small/documents.parquet")
    val out = scratch("export-shrink")
    val nBig = ExportJob.writeTrainingShards(spark, big, out).collect()
      .map(_.getAs[Long]("shard_id")).distinct.length
    val kept = ExportJob.writeTrainingShards(spark, small, out).collect()
    val keptShards = kept.map(_.getAs[Long]("shard_id")).distinct.sorted
    assert(keptShards.length < nBig, "fixture must actually shrink the shard count")
    // the export zone holds EXACTLY the new shard set — a per-partition
    // overwrite would have left the trailing stale directories behind
    val dirs = new File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard_id=")).sorted
    assert(dirs.toSeq === keptShards.map(k => s"shard_id=$k").toSeq)
    val total = spark.read.json(out).count()
    assert(total === kept.length.toLong)
  }
}
