package graft.queries

import java.io.File
import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.core.Tables

/** Contracts for n16's incremental index maintenance
  * ([[Similarity.appendToIvfPqIndex]]): with FROZEN quantizers an appended
  * index must be indistinguishable from a frozen-quantizer rebuild, a
  * re-landed append must be content-idempotent, and the append must touch
  * ONLY the delta's cell partitions — proven byte-wise (untouched
  * partition fingerprints) and behaviorally (a poisoned foreign partition
  * never read).
  */
class IvfPqAppendSpec extends SparkTestBase {

  private lazy val SfDir = testData("0.001")

  private def norm(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  private def unionCorpus =
    Tables(spark, SfDir).embeddings.select("vec_id", "embedding")

  test("append-then-probe equals frozen-quantizer rebuild-then-probe") {
    val idxA = scratch("ivfpq_append_eq_a")
    val idxR = scratch("ivfpq_append_eq_r")
    Similarity.buildIvfPqBaseIndex(spark, SfDir, idxA)
    val touched = Similarity.appendToIvfPqIndex(spark, idxA,
      Similarity.appendDelta(spark, SfDir))
    assert(touched.nonEmpty, "the fixture delta must land somewhere")
    // frozen-quantizer REBUILD: recode the whole union corpus in one
    // append onto a fresh base index — the anti-join replaces every base
    // row, so codes/ afterwards is exactly what a from-scratch coding
    // pass under the same (frozen) quantizers writes
    Similarity.buildIvfPqBaseIndex(spark, SfDir, idxR)
    Similarity.appendToIvfPqIndex(spark, idxR, unionCorpus)
    val a = norm(Similarity.probeIvfPqIndex(spark, SfDir, idxA, nprobe = 2))
    val r = norm(Similarity.probeIvfPqIndex(spark, SfDir, idxR, nprobe = 2))
    assert(a.nonEmpty && a == r,
      "an appended index must serve exactly what a frozen-quantizer rebuild serves")
  }

  test("re-landing the same append is content-idempotent") {
    val idx = scratch("ivfpq_append_idem")
    Similarity.buildIvfPqBaseIndex(spark, SfDir, idx)
    val delta = Similarity.appendDelta(spark, SfDir)
    val t1 = Similarity.appendToIvfPqIndex(spark, idx, delta)
    val once = norm(Similarity.probeIvfPqIndex(spark, SfDir, idx, nprobe = 2))
    val codesOnce = spark.read.parquet(s"$idx/codes").count()
    val t2 = Similarity.appendToIvfPqIndex(spark, idx, delta)
    assert(t2 == t1, "a redelivered batch must touch the same cells")
    assert(spark.read.parquet(s"$idx/codes").count() == codesOnce,
      "a redelivered batch must not duplicate any row (upsert semantics)")
    assert(norm(Similarity.probeIvfPqIndex(spark, SfDir, idx, nprobe = 2)) == once)
  }

  test("appending one vector rewrites exactly its cell partition") {
    val idx = scratch("ivfpq_append_one")
    Similarity.buildIvfPqBaseIndex(spark, SfDir, idx)
    val cellDirs = new File(s"$idx/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(_.getName).toSeq
    assert(cellDirs.size > 1, "fixture must spread the base over >1 cell")
    val before = cellDirs.map(d => d -> fsFingerprint(s"$idx/codes/$d")).toMap
    val one = Similarity.appendDelta(spark, SfDir).limit(1)
    val touched = Similarity.appendToIvfPqIndex(spark, idx, one)
    assert(touched.size == 1, s"one vector must touch one cell, got $touched")
    val touchedDir = s"cell=${touched.head}"
    cellDirs.filterNot(_ == touchedDir).foreach { d =>
      assert(fsFingerprint(s"$idx/codes/$d") == before(d),
        s"untouched partition $d was rewritten by the append")
    }
    assert(fsFingerprint(s"$idx/codes/$touchedDir") != before.get(touchedDir).orNull,
      "the touched partition must actually change")
  }

  test("append never lists untouched partitions: a poisoned foreign partition never fails it") {
    val idx = scratch("ivfpq_append_poison")
    Similarity.buildIvfPqBaseIndex(spark, SfDir, idx)
    val poison = Paths.get(s"$idx/codes/cell=999/garbage.parquet")
    Files.createDirectories(poison.getParent)
    Files.write(poison, "this is not a parquet file".getBytes("UTF-8"))
    intercept[Throwable] {
      spark.read.parquet(s"$idx/codes").count()
    }
    val touched = Similarity.appendToIvfPqIndex(spark, idx,
      Similarity.appendDelta(spark, SfDir))
    assert(touched.nonEmpty && !touched.contains(999L))
    // the poison survives the append untouched — dynamic overwrite swapped
    // only the delta's partitions
    assert(Files.exists(poison), "the foreign partition must be left alone")
  }

  test("the registry twin serves the explicitly composed artifact") {
    val idx = scratch("ivfpq_append_twin")
    Similarity.buildIvfPqBaseIndex(spark, SfDir, idx)
    Similarity.appendToIvfPqIndex(spark, idx, Similarity.appendDelta(spark, SfDir))
    val explicit = norm(Similarity.probeIvfPqIndex(spark, SfDir, idx, nprobe = 2))
    assert(norm(Similarity.ivfPqAppendTopK(spark, SfDir)) == explicit)
  }
}
