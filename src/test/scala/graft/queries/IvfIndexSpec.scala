package graft.queries

import java.io.File
import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Contracts for the persisted IVF index (n7): the probe must reproduce the
  * from-scratch IVF exactly, run standalone against the artifacts (no
  * recompute), and actually PRUNE — unprobed cell directories are never
  * opened, proven behaviorally with a poisoned partition.
  */
class IvfIndexSpec extends SparkTestBase {

  private lazy val SfDir = testData("0.001")

  private def norm(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("probe over the persisted index equals the from-scratch IVF, twice, without rebuilding") {
    val idx = scratch("ivf_idx_eq")
    Similarity.buildIvfIndex(spark, SfDir, idx)
    val want = norm(Similarity.ivfTopK(spark, SfDir))
    assert(norm(Similarity.probeIvfIndex(spark, SfDir, idx, nprobe = 2)) == want)
    // second probe: same artifacts, no rebuild — the standalone contract
    assert(norm(Similarity.probeIvfIndex(spark, SfDir, idx, nprobe = 2)) == want)
  }

  test("the probed-cells predicate reaches the file index as a partition filter") {
    val idx = scratch("ivf_idx_plan")
    Similarity.buildIvfIndex(spark, SfDir, idx)
    val plan = Similarity.probeIvfIndex(spark, SfDir, idx, nprobe = 2)
      .queryExecution.executedPlan.toString
    // non-empty filter content on the cell column — "PartitionFilters: ["
    // alone also matches an empty list (r18 advice)
    assert(plan.contains("PartitionFilters: [cell#"), plan)
  }

  test("pruning is real: a poisoned unprobed cell directory never fails a probe") {
    val idx = scratch("ivf_idx_poison")
    Similarity.buildIvfIndex(spark, SfDir, idx)
    // cell id 999 can never be probed (no such centroid); a garbage file
    // there kills any reader that opens it
    val poison = Paths.get(s"$idx/cells/cell=999/garbage.parquet")
    Files.createDirectories(poison.getParent)
    Files.write(poison, "this is not a parquet file".getBytes("UTF-8"))
    // an unpruned full scan of the cells dir must hit the poison...
    intercept[Throwable] {
      spark.read.parquet(s"$idx/cells").count()
    }
    // ...while the pruned probe never opens it
    val got = Similarity.probeIvfIndex(spark, SfDir, idx, nprobe = 2)
    assert(norm(got) == norm(Similarity.ivfTopK(spark, SfDir)))
  }

  test("memo hit on scheme-qualified (file:) artifacts: repeat build never rewrites") {
    // r16's freshness probe checked artifact existence via scheme-blind
    // java.nio Files.exists — a scheme-qualified indexDir (file: here,
    // any remote FS in production) looked missing, so every build request
    // silently rebuilt the whole index, defeating build-once/probe-many.
    // Fingerprint the artifacts through the path's OWN FileSystem and pin
    // that a second build is a memo hit: the identical memoized instance
    // back, zero bytes rewritten.
    val idx = "file:" + scratch("ivf_idx_scheme")
    val c1 = Similarity.buildIvfIndex(spark, SfDir, idx)
    val f1 = fsFingerprint(idx)
    assert(f1.nonEmpty, "build wrote no artifacts under the file: indexDir")
    val c2 = Similarity.buildIvfIndex(spark, SfDir, idx)
    assert(c2 eq c1, "second build must be a memo hit (same instance), not a rebuild")
    assert(fsFingerprint(idx) == f1, "memo hit must not rewrite any artifact file")
    // and the scheme-qualified index serves the canonical answer
    assert(norm(Similarity.probeIvfIndex(spark, SfDir, idx, nprobe = 2)) ==
      norm(Similarity.ivfTopK(spark, SfDir)))
  }

  test("index layout: hive-partitioned cells plus a metadata-scale centroid table") {
    val idx = scratch("ivf_idx_layout")
    Similarity.buildIvfIndex(spark, SfDir, idx)
    val cellDirs = new File(s"$idx/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "cells must be written as cell=N partitions")
    val cents = spark.read.parquet(s"$idx/centroids.parquet")
    assert(cents.count() == 8 && cents.columns.sorted.toSeq == Seq("cid", "cnorm", "cv"))
  }
}
