package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object Bench {
  /** Force execution of EVERY output column. A bare count() lets Catalyst
    * prune away projection-only work (the scan short-circuits to row
    * counting), so expression-heavy queries would report near-zero time;
    * consuming the plan's own UnsafeRows instead materializes all columns
    * without bolting an extra aggregation exchange onto every query.
    */
  private def materialize(df: DataFrame): Long =
    df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // same AQE sizing posture as GraftSession.local (see its scaladoc):
      // oversized pre-coalesce partition count + realistic broadcast ceiling
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 16).toString)
      .config("spark.sql.autoBroadcastJoinThreshold",
        (128 * 1024 * 1024).toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: absorb JVM classloading + codegen compilation so the
    // first timed query isn't charged for it (it was ~5 s of noise).
    SparkEntry.queries.get("q6_revenue_forecast").foreach { fn =>
      try materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    // SPARK_GRAFT_ONLY=q1,q2 limits the run (local iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      // best of two runs: single-shot numbers swing ±15% from GC/JIT noise
      // (measured across identical runs); min-of-2 reports the query's
      // actual cost, not whichever pause landed on it. A run that throws
      // contributes NO time — a broken query must read as failed, not as
      // a fast time-to-exception.
      val times = (1 to 2).flatMap { rep =>
        // clean slate between queries: prior queries' garbage (shuffle
        // buffers, codegen classes) otherwise bills GC pauses to whoever
        // runs next — measured up to 8x inflation on trivial projections
        System.gc()
        val t0 = System.nanoTime()
        try {
          materialize(fn(spark, sfDir))
          val sec = (System.nanoTime() - t0) / 1e9
          if (sys.env.contains("SPARK_GRAFT_VERBOSE"))
            System.err.println(f"[bench] $name rep$rep: $sec%.3f s")
          Some(sec)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      name -> times.minOption
    }
    // 2-decimal (10 ms) precision, trailing zeros stripped, sf as basename:
    // keeps every line compact for consumers that retain a bounded tail
    def f3(v: Double): String =
      java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .stripTrailingZeros().toPlainString()
    def qjson(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    val failed = results.collect { case (n, None) => n }
    val ok = results.collect { case (n, Some(t)) => n -> t }
    val sfName = new java.io.File(sfDir).getName
    // Output layout for a consumer that keeps only a bounded TAIL of
    // stdout: the full per-query detail goes FIRST in small chunks, and
    // the one-line summary goes LAST so it always survives truncation.
    // The summary's own `queries` map carries only the slowest entries —
    // the full 70+-query map is what overran the tail in earlier rounds.
    ok.grouped(12).zipWithIndex.foreach { case (grp, i) =>
      println(s"""{"metric":"queries","part":${i + 1},"queries":${qjson(grp)}}""")
    }
    val total = ok.map(_._2).sum
    val slowest = ok.sortBy(-_._2).take(20).sortBy(_._1)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The stdout tail only reliably carries the summary line; persist the
    // COMPLETE per-query map to a file so the fast half of the suite keeps
    // a timing history across rounds too.
    val detail =
      s"""{"sf":"$sfName","n_queries":${ok.size},"total":${f3(total)},"failed":$failedJson,"queries":${qjson(ok)}}"""
    val detailPath = java.nio.file.Paths.get("target", "bench_detail.json")
    java.nio.file.Files.createDirectories(detailPath.getParent)
    java.nio.file.Files.write(detailPath, detail.getBytes("UTF-8"))
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":${qjson(slowest)},"n_queries":${ok.size},"failed":$failedJson,"sf":"$sfName"}""")
    spark.stop()
  }
}
