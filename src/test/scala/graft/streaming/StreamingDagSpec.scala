package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.pipeline.{FixtureBinaries, FixtureExtractor, Pipeline}

/** The full event-driven DAG as four chained streaming queries (the
  * reference's S3-event wiring, `main.tf:234-263`): PDFs → pages → silver
  * JSON → {clean zone, crops}, each hop checkpointed.
  */
class StreamingDagSpec extends SparkTestBase {

  test("streaming DAG: raw PDFs drain through all four hops; re-run is a no-op") {
    val zones = Pipeline.Zones(scratch("stream-dag"))
    FixtureBinaries.writeRawPdfs(zones.raw)
    PipelineStreams.runDag(spark, zones, new FixtureExtractor())

    // interim: 2 pages per fixture PDF
    assert(countFiles(zones.interim, ".jpg") === 4)
    // silver: one JSON doc per page
    assert(countFiles(zones.silver, ".json") === 4)
    // clean: all 13 fixture products, partitioned
    assert(spark.read.parquet(zones.clean).count() === 13)
    // crops: every valid-bbox product on an existing page
    assert(countFiles(zones.shr, ".jpg") === 10)

    // nothing new arrived -> every checkpoint suppresses re-processing and
    // every sink stays byte-stable
    val before = snapshot(zones.clean)
    PipelineStreams.runDag(spark, zones, new FixtureExtractor())
    assert(countFiles(zones.shr, ".jpg") === 10)
    assert(snapshot(zones.clean) === before)
  }

  private def countFiles(root: String, suffix: String): Long = {
    if (!Files.exists(Paths.get(root))) 0L
    else Files.walk(Paths.get(root)).filter(_.toString.endsWith(suffix)).count()
  }

  /** Parquet file listing + sizes — stable iff the zone was untouched. */
  private def snapshot(root: String): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(p => (p.toString, Files.size(p))).toSeq.sortBy(_._1)
  }
}
