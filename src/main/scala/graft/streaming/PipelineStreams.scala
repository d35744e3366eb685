package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.{CleanJob, ProductSchema}

/** The event-driven DAG as Structured Streaming (S7/§2.10; reference wiring
  * `infrastructure/main.tf:234-263`): new-file discovery on the silver zone
  * replaces S3 ObjectCreated events, the checkpoint's file-source log
  * replaces every ad-hoc "already processed?" existence check (F3), and the
  * dynamic-partition-overwrite sink keeps re-delivery idempotent — strictly
  * better failure semantics than the reference's check-then-write race
  * (SURVEY §7.4 item 4).
  *
  * `Trigger.AvailableNow` turns the same query into the `bulk_clean.sh`
  * backfill (E3): drain everything outstanding, then stop.
  */
object PipelineStreams {

  /** Streaming clean: silver JSON arrivals → CleanJob transform →
    * partitioned clean zone. `maxFilesPerTrigger` bounds batch size — the
    * engine-native replacement for the reference's Lambda time-budget
    * chunking (`vision_parserLambda.py:183-191`).
    */
  def cleanStream(spark: SparkSession, silverGlob: String, cleanRoot: String,
                  checkpoint: String, trigger: Trigger = Trigger.AvailableNow(),
                  maxFilesPerTrigger: Int = 256): StreamingQuery = {
    val silver = spark.readStream
      .schema(ProductSchema.silver)
      .option("multiLine", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .json(silverGlob)
      .withColumn("_src_path", input_file_name())
    silver.writeStream
      .queryName("graft-clean-stream")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        CleanJob.writeClean(CleanJob.clean(batch), cleanRoot)
      }
      .start()
  }

  /** Drain-everything backfill (blocks until done) — `bulk_clean.sh` in one
    * call: the checkpoint makes re-runs incremental, the sink makes
    * re-delivery idempotent.
    */
  def backfill(spark: SparkSession, silverGlob: String, cleanRoot: String,
               checkpoint: String): Unit =
    cleanStream(spark, silverGlob, cleanRoot, checkpoint,
      Trigger.AvailableNow()).awaitTermination()
}
