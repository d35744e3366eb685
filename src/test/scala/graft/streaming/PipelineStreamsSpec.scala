package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Streaming semantics tests (§2.10): exactly-once file handling via the
  * checkpoint (replacing the reference's F3 existence checks) and idempotent
  * partition overwrite under re-delivery.
  */
class PipelineStreamsSpec extends SparkTestBase {

  private val FixtureRoot = "/root/repo/fixtures/silver/PnP"

  private def copyFixture(rel: String, silverRoot: String): Unit = {
    val src = Paths.get(s"$FixtureRoot/$rel")
    val dst = Paths.get(s"$silverRoot/$rel")
    Files.createDirectories(dst.getParent)
    Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
  }

  test("AvailableNow backfill drains everything; re-run with checkpoint is a no-op; new files are incremental") {
    val silver = scratch("stream-silver")
    val clean = scratch("stream-clean")
    val ckpt = scratch("stream-ckpt")
    val glob = s"$silver/*/*/*.json"

    copyFixture("Gauteng/13_February_-_15_February_2026/page_1.json", silver)
    copyFixture("Gauteng/13_February_-_15_February_2026/page_2.json", silver)
    PipelineStreams.backfill(spark, glob, clean, ckpt)
    assert(spark.read.parquet(clean).count() === 8)

    // exactly-once: nothing new -> the already-processed files must NOT be
    // re-delivered (and the clean zone must be untouched)
    PipelineStreams.backfill(spark, glob, clean, ckpt)
    assert(spark.read.parquet(clean).count() === 8)

    // incremental: a late-arriving file lands in ITS partition only
    copyFixture("Eastern_Cape/20_February_-_22_February_2026/page_1.json", silver)
    PipelineStreams.backfill(spark, glob, clean, ckpt)
    val after = spark.read.parquet(clean)
    assert(after.count() === 13)
    assert(after.filter(col("province") === "Gauteng").count() === 8)
  }

  test("re-delivered (modified) file overwrites its partition idempotently") {
    val silver = scratch("stream-redeliver-silver")
    val clean = scratch("stream-redeliver-clean")
    val ckpt = scratch("stream-redeliver-ckpt")
    val glob = s"$silver/*/*/*.json"

    copyFixture("Gauteng/13_February_-_15_February_2026/page_1.json", silver)
    PipelineStreams.backfill(spark, glob, clean, ckpt)
    assert(spark.read.parquet(clean).count() === 4)

    // the same logical file re-arrives under a new name (the reference's
    // re-delivery shape): dynamic overwrite replaces the whole partition
    // with the new batch -> no duplicate accumulation across page files
    copyFixture("Gauteng/13_February_-_15_February_2026/page_2.json", silver)
    PipelineStreams.backfill(spark, glob, clean, ckpt)
    val rows = spark.read.parquet(clean)
    // page_2 batch overwrote the Gauteng partition (partition-granular
    // replace, file-granular arrivals): 4 page_2 rows remain
    assert(rows.filter(col("source_file") === "page_2.json").count() === 4)
  }
}
