package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.functions.VectorOps

/** Throwaway phase profiler for the n4/d11 x100 cost (deleted before
  * round end) — times each stage of the literal-quantizer pipeline.
  */
object ProfTmp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/x100")
    val spark = GraftSession.local("graft-prof")
    spark.sparkContext.setLogLevel("WARN")
    VectorOps.register(spark)
    val numCells = graft.ScaleStress.d11Cells(100)

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val e0 = Tables(spark, dir).embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("norm", sqrt(expr("graft_dot(v, v)")))
    println(s"[prof] scan partitions: ${e0.rdd.getNumPartitions}, " +
      s"parallelism: ${spark.sparkContext.defaultParallelism}, K: $numCells")
    t("count(e0)")(e0.count())
    t("count(e0) again")(e0.count())

    val seeds = t("seedCentroids")(Similarity.seedCentroids(e0, numCells))
    val r1 = t("lloydRound 1")(Similarity.lloydRoundLiteral(e0, seeds))
    val r2 = t("lloydRound 2")(Similarity.lloydRoundLiteral(e0, r1))
    t("assign count") {
      e0.withColumn("cell", Similarity.cellExpr(r2, col("v"), col("norm")))
        .selectExpr("count(distinct cell)").collect()
    }
    t("n4 full")(Similarity.ivfTopK(spark, dir, nprobe = 2, numCells = numCells).queryExecution.toRdd.count())
    t("d11 full")(Dedup.semanticDedup(spark, dir, numCells).queryExecution.toRdd.count())
    spark.stop()
  }
}
