package graft

// THROWAWAY round-22 profiling main — removed before round end.
// Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 sbt "runMain graft.Prof22 <what>"
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Prof22 {
  private val jobs = new java.util.concurrent.atomic.AtomicInteger
  private val stages = new java.util.concurrent.atomic.AtomicInteger
  private val tasks = new java.util.concurrent.atomic.AtomicInteger

  private final class Counter extends org.apache.spark.scheduler.SparkListener {
    override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks)
    }
  }

  private def t[A](label: String)(f: => A): A = {
    val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s" +
      s" jobs=${jobs.get - j0} stages=${stages.get - s0} tasks=${tasks.get - k0}")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 16).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (128 * 1024 * 1024).toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new Counter)
    def mat(df: DataFrame): Long = df.queryExecution.toRdd.count()
    // warm-up
    try mat(SparkEntry.queries("q6_revenue_forecast")(spark, sfDir)) catch { case _: Throwable => () }

    args.headOption.getOrElse("d14") match {
      case "d14" =>
        (1 to 3).foreach { i =>
          t(s"d14 full run $i") {
            mat(graft.queries.Dedup.incrementalVerdictsQuery(spark, sfDir))
          }
        }
        // decomposition
        val docs = graft.core.Tables(spark, sfDir).documents
        val maxId = docs.agg(max("doc_id")).first().getLong(0)
        val (c1, c2) = (maxId / 3, 2 * maxId / 3)
        val allBands = t("allBands checkpoint") {
          graft.operators.TextDedup.minhashBandsAgg(docs).localCheckpoint()
        }
        System.err.println(s"[prof] allBands partitions: ${allBands.rdd.getNumPartitions}, rows: ${allBands.count()}")
        val batchBands = Seq(
          allBands.filter(col("doc_id") <= c1),
          allBands.filter(col("doc_id") > c1 && col("doc_id") <= c2),
          allBands.filter(col("doc_id") > c2))
        var ledger = graft.operators.TextDedup.emptyNearDupLedger(spark)
        val outs = batchBands.zipWithIndex.map { case (bb, i) =>
          val (v, next) =
            graft.operators.TextDedup.incrementalVerdictsFromBands(bb, ledger)
          ledger = t(s"ledger ckpt $i") { next.localCheckpoint() }
          v
        }
        t("final union") { mat(outs.reduce(_ unionByName _).orderBy("doc_id")) }
      case "d14ab" =>
        val docs = graft.core.Tables(spark, sfDir).documents
        def oldD14(): DataFrame = {
          val maxId = docs.agg(max("doc_id")).first().getLong(0)
          val (c1, c2) = (maxId / 3, 2 * maxId / 3)
          val batches = Seq(
            docs.filter(col("doc_id") <= c1),
            docs.filter(col("doc_id") > c1 && col("doc_id") <= c2),
            docs.filter(col("doc_id") > c2))
          var ledger = graft.operators.TextDedup.emptyNearDupLedger(spark)
          val outs = batches.map { b =>
            val (v, next) = graft.operators.TextDedup.incrementalVerdicts(b, ledger)
            ledger = next.localCheckpoint()
            v
          }
          outs.reduce(_ unionByName _).orderBy("doc_id")
        }
        (1 to 4).foreach { i =>
          t(s"OLD d14 run $i") { mat(oldD14()) }
        }
        (1 to 4).foreach { i =>
          t(s"NEW d14 run $i") {
            mat(graft.queries.Dedup.incrementalVerdictsQuery(spark, sfDir))
          }
        }
        (1 to 2).foreach { i =>
          t(s"OLD d14 again $i") { mat(oldD14()) }
        }
        // phase decomposition, old
        locally {
          val maxId = t("OLD max") { docs.agg(max("doc_id")).first().getLong(0) }
          val (c1, c2) = (maxId / 3, 2 * maxId / 3)
          val batches = Seq(
            docs.filter(col("doc_id") <= c1),
            docs.filter(col("doc_id") > c1 && col("doc_id") <= c2),
            docs.filter(col("doc_id") > c2))
          var ledger = graft.operators.TextDedup.emptyNearDupLedger(spark)
          val outs = batches.zipWithIndex.map { case (b, i) =>
            val bands = t(s"OLD bands ckpt $i") {
              graft.operators.TextDedup.minhashBandsAgg(b).localCheckpoint()
            }
            val (v, next) =
              graft.operators.TextDedup.incrementalVerdictsFromBands(bands, ledger)
            ledger = t(s"OLD ledger ckpt $i") { next.localCheckpoint() }
            v
          }
          t("OLD final union") { mat(outs.reduce(_ unionByName _).orderBy("doc_id")) }
        }
        // phase decomposition, new
        locally {
          val maxId = t("NEW max") { docs.agg(max("doc_id")).first().getLong(0) }
          val (c1, c2) = (maxId / 3, 2 * maxId / 3)
          val allBands = t("NEW allBands ckpt") {
            graft.operators.TextDedup.minhashBandsAgg(docs).localCheckpoint()
          }
          val batchBands = Seq(
            allBands.filter(col("doc_id") <= c1),
            allBands.filter(col("doc_id") > c1 && col("doc_id") <= c2),
            allBands.filter(col("doc_id") > c2))
          var ledger = graft.operators.TextDedup.emptyNearDupLedger(spark)
          val outs = batchBands.zipWithIndex.map { case (bb, i) =>
            val (v, next) =
              graft.operators.TextDedup.incrementalVerdictsFromBands(bb, ledger)
            ledger = t(s"NEW ledger ckpt $i") { next.localCheckpoint() }
            v
          }
          t("NEW final union") { mat(outs.reduce(_ unionByName _).orderBy("doc_id")) }
        }
      case "d14aqe" =>
        val docs = graft.core.Tables(spark, sfDir).documents
        def oldD14(): DataFrame = {
          val maxId = docs.agg(max("doc_id")).first().getLong(0)
          val (c1, c2) = (maxId / 3, 2 * maxId / 3)
          val batches = Seq(
            docs.filter(col("doc_id") <= c1),
            docs.filter(col("doc_id") > c1 && col("doc_id") <= c2),
            docs.filter(col("doc_id") > c2))
          var ledger = graft.operators.TextDedup.emptyNearDupLedger(spark)
          val outs = batches.map { b =>
            val (v, next) = graft.operators.TextDedup.incrementalVerdicts(b, ledger)
            ledger = next.localCheckpoint()
            v
          }
          outs.reduce(_ unionByName _).orderBy("doc_id")
        }
        (1 to 3).foreach { i => t(s"AQE-on d14 $i") { mat(oldD14()) } }
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        (1 to 3).foreach { i => t(s"AQE-off p4 d14 $i") { mat(oldD14()) } }
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        (1 to 3).foreach { i => t(s"AQE-off p32 d14 $i") { mat(oldD14()) } }
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        (1 to 2).foreach { i => t(s"AQE-on again d14 $i") { mat(oldD14()) } }
      case "d14fuse" =>
        val docs = graft.core.Tables(spark, sfDir).documents
        def oldD14(): DataFrame = {
          val maxId = docs.agg(max("doc_id")).first().getLong(0)
          val (c1, c2) = (maxId / 3, 2 * maxId / 3)
          val batches = Seq(
            docs.filter(col("doc_id") <= c1),
            docs.filter(col("doc_id") > c1 && col("doc_id") <= c2),
            docs.filter(col("doc_id") > c2))
          var ledger = graft.operators.TextDedup.emptyNearDupLedger(spark)
          val outs = batches.map { b =>
            val (v, next) = graft.operators.TextDedup.incrementalVerdicts(b, ledger)
            ledger = next.localCheckpoint()
            v
          }
          outs.reduce(_ unionByName _).orderBy("doc_id")
        }
        def fusedD14(): DataFrame = {
          val maxId = docs.agg(max("doc_id")).first().getLong(0)
          val (c1, c2) = (maxId / 3, 2 * maxId / 3)
          val batches = Seq(
            docs.filter(col("doc_id") <= c1),
            docs.filter(col("doc_id") > c1 && col("doc_id") <= c2),
            docs.filter(col("doc_id") > c2))
          var ledger = graft.operators.TextDedup.emptyNearDupLedger(spark)
          val outs = batches.map { b =>
            val (v, next) = graft.operators.TextDedup.incrementalVerdicts(b, ledger)
            val combined = v.select(lit(0).as("t"), col("doc_id").as("c1"),
                col("is_near_dup").cast("long").as("c2"), col("n_hit_bands").as("c3"))
              .unionByName(next.select(lit(1).as("t"), col("band").cast("long").as("c1"),
                col("bh").as("c2"), col("min_doc_id").as("c3")))
              .localCheckpoint()
            ledger = combined.filter(col("t") === 1)
              .select(col("c1").cast("int").as("band"), col("c2").as("bh"),
                col("c3").as("min_doc_id"))
            combined.filter(col("t") === 0)
              .select(col("c1").as("doc_id"), col("c2").cast("int").as("is_near_dup"),
                col("c3").as("n_hit_bands"))
          }
          outs.reduce(_ unionByName _).orderBy("doc_id")
        }
        def bothD14(): DataFrame = {
          val maxId = docs.agg(max("doc_id")).first().getLong(0)
          val (c1, c2) = (maxId / 3, 2 * maxId / 3)
          val allBands = graft.operators.TextDedup.minhashBandsAgg(docs)
            .localCheckpoint()
          val batchBands = Seq(
            allBands.filter(col("doc_id") <= c1),
            allBands.filter(col("doc_id") > c1 && col("doc_id") <= c2),
            allBands.filter(col("doc_id") > c2))
          var ledger = graft.operators.TextDedup.emptyNearDupLedger(spark)
          val outs = batchBands.map { bb =>
            val (v, next) =
              graft.operators.TextDedup.incrementalVerdictsFromBands(bb, ledger)
            val combined = v.select(lit(0).as("t"), col("doc_id").as("c1"),
                col("is_near_dup").cast("long").as("c2"), col("n_hit_bands").as("c3"))
              .unionByName(next.select(lit(1).as("t"), col("band").cast("long").as("c1"),
                col("bh").as("c2"), col("min_doc_id").as("c3")))
              .localCheckpoint()
            ledger = combined.filter(col("t") === 1)
              .select(col("c1").cast("int").as("band"), col("c2").as("bh"),
                col("c3").as("min_doc_id"))
            combined.filter(col("t") === 0)
              .select(col("c1").as("doc_id"), col("c2").cast("int").as("is_near_dup"),
                col("c3").as("n_hit_bands"))
          }
          outs.reduce(_ unionByName _).orderBy("doc_id")
        }
        (1 to 3).foreach { i => t(s"OLD d14 $i") { mat(oldD14()) } }
        (1 to 3).foreach { i => t(s"FUSED d14 $i") { mat(fusedD14()) } }
        (1 to 3).foreach { i => t(s"BOTH d14 $i") { mat(bothD14()) } }
        (1 to 2).foreach { i => t(s"OLD again $i") { mat(oldD14()) } }
        (1 to 2).foreach { i => t(s"FUSED again $i") { mat(fusedD14()) } }
        (1 to 2).foreach { i => t(s"BOTH again $i") { mat(bothD14()) } }
      case "d9" =>
        (1 to 3).foreach { i =>
          t(s"d9 full run $i") {
            mat(graft.queries.Dedup.dupClusters(spark, sfDir))
          }
        }
      case "floor" =>
        (1 to 4).foreach { i =>
          t(s"floor replay $i") {
            graft.streaming.EventStreams.replayOnce(
              graft.streaming.EventStreams.readEvents(spark, sfDir)
                .select("event_id"),
              s"prof_floor_$i",
              org.apache.spark.sql.streaming.OutputMode.Append()).count()
          }
          t(s"readEvents only $i") {
            graft.streaming.EventStreams.readEvents(spark, sfDir).schema
          }
        }
      case other => System.err.println(s"unknown: $other")
    }
    spark.stop()
  }
}
