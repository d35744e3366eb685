package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.queries.Dedup

/** Scale-stress harness: measures the dedup/graph/ANN family on synthetic
  * corpora 10x/100x the sf0.1 fixtures and records size-vs-time curves
  * (SCALING.md). This is the empirical backing for every "100 TB-safe by
  * plan shape" claim — a plan that is secretly quadratic shows up here as a
  * superlinear bend long before a cluster would reveal it.
  *
  * Corpus construction (deterministic, seeded by structure not RNG): the
  * base sf0.1 documents table is replicated k times; replica r suffixes
  * every whitespace token with "·r" so
  *  - WITHIN a replica the duplicate/near-dup structure of the base corpus
  *    is preserved EXACTLY (two texts that matched still match — the same
  *    rewrite is applied to both), and
  *  - ACROSS replicas no shingle/gram/token is ever shared (disjoint
  *    vocabularies), so no cross-replica candidate pairs exist.
  * Output sizes (dup groups, near-dup pairs, clusters) therefore scale
  * exactly linearly with k, which makes TIME-vs-k directly interpretable:
  * a correct shuffle-bounded plan should track the input growth, and any
  * all-pairs mistake would blow up as k².
  *
  * Embeddings replicate with vec_id offset by 1M per replica (the n1/n2
  * query set is pinned at vec_id < 20, so |Q| stays constant while the
  * corpus grows — the measurement isolates corpus-side cost) and a small
  * deterministic per-element perturbation so replicas are not bitwise
  * duplicates of each other.
  *
  * Run: SPARK_GRAFT_SCALES=1,10,100 sbt "runMain graft.ScaleStress"
  * Emits one JSON line per (scale, query) and target/scaling.json at exit.
  */
object ScaleStress {

  /** doc_id/vec_id replica offset; far above any base id (max 4999). */
  private val IdOffset = 1000000L

  private val Queries = Seq(
    "d1_exact_dedup", "d2_minhash_lsh", "d5_ngram_jaccard",
    "d9_dup_clusters", "t14_corpus_curation", "n2_lsh_bucket_topk")

  private def materialize(df: DataFrame): Long = df.queryExecution.toRdd.count()

  /** Replicate the base corpus k-fold into outDir (idempotent: skipped when
    * the marker of a completed generation exists).
    */
  private def generate(spark: SparkSession, baseDir: String, outDir: String,
      k: Int): Unit = {
    val done = new java.io.File(s"$outDir/_GENERATED")
    if (done.exists()) return
    val reps = spark.range(0, k).select(col("id").as("rep"))

    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
      .crossJoin(broadcast(reps))
      // per-replica token suffix: disjoint vocabularies across replicas,
      // identical rewrite within one (see scaladoc). The lambda captures
      // the outer `rep` column.
      .withColumn("text",
        concat_ws(" ", expr(
          "transform(split(text, ' '), t -> concat(t, '·', CAST(rep AS STRING)))")))
      .select(
        (col("doc_id") + col("rep") * IdOffset).as("doc_id"),
        col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
    docs.repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
      .crossJoin(broadcast(reps))
      // replica 0 keeps the base vectors bit-for-bit; later replicas get a
      // small deterministic per-element shift so they are distinct vectors
      // with the same scale/distribution (hash() is seed-stable)
      .withColumn("embedding",
        when(col("rep") === 0, col("embedding")).otherwise(expr(
          """transform(embedding, (x, i) ->
            |  CAST(x + 0.03 * (pmod(hash(vec_id, rep, i), 13) - 6) AS FLOAT))"""
            .stripMargin)))
      .select(
        (col("vec_id") + col("rep") * IdOffset).as("vec_id"),
        col("embedding"), col("label"))
    emb.repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    done.getParentFile.mkdirs()
    java.nio.file.Files.write(done.toPath, Array.emptyByteArray)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = GraftSession.local("graft-scale-stress")

    def f2(v: Double): String =
      java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP).toPlainString()

    // untimed warm-up at the base scale: absorb classloading + codegen
    SparkEntry.queries.get("d1_exact_dedup").foreach { fn =>
      try materialize(fn(spark, baseDir)) catch { case _: Throwable => () }
    }

    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    scales.foreach { k =>
      val dir = s"target/scale/x$k"
      val t0 = System.nanoTime()
      generate(spark, baseDir, dir, k)
      val genSec = (System.nanoTime() - t0) / 1e9
      println(s"""{"scale":$k,"event":"generated","sec":${f2(genSec)}}""")
      Queries.filter(q => only.forall(_.contains(q))).foreach { name =>
        val fn = SparkEntry.queries(name)
        // cold per query: no memoized signatures, no cached frames, fresh
        // GC baseline — the curve must measure end-to-end per-query cost
        Dedup.clearMemos()
        spark.catalog.clearCache()
        System.gc()
        val q0 = System.nanoTime()
        val rows =
          try materialize(fn(spark, dir))
          catch { case e: Throwable =>
            System.err.println(s"[scale] x$k $name failed: ${e.getMessage}")
            -1L
          }
        val sec = (System.nanoTime() - q0) / 1e9
        val line =
          s"""{"scale":$k,"query":"$name","sec":${f2(sec)},"rows":$rows}"""
        println(line)
        results += line
      }
    }
    val out = results.mkString("[\n  ", ",\n  ", "\n]")
    val p = java.nio.file.Paths.get("target", "scaling.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, out.getBytes("UTF-8"))
    println(s"""{"event":"done","n":${results.size}}""")
    spark.stop()
  }
}
