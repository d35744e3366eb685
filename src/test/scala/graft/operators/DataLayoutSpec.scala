package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The z-order layout's pruning contract, checked from the same parquet
  * footer statistics the reader's row-group filter consults: for a 2-D box
  * predicate, the z layout leaves only a few percent of rows in
  * stats-intersecting row groups, while a single-column sort must read
  * every row group of the un-sorted dimension's matching stripe. Also pins
  * that the rewrite loses no rows and that Spark pushes both predicates to
  * the scan (without which the stats never engage).
  */
class DataLayoutSpec extends SparkTestBase {
  import spark.implicits._

  // 40k rows uniform over a 200x200 (a, b) grid — both dims independent.
  private lazy val df = spark.range(200000).select(
    col("id"),
    (hash(col("id"), lit(1)).cast("long") % 200 + 200) % 200 as "a",
    (hash(col("id"), lit(2)).cast("long") % 200 + 200) % 200 as "b")

  // 10% x 10% box
  private val (aLo, aHi, bLo, bHi) = (40L, 59L, 100L, 119L)

  private def intersectingRowFraction(path: String): Double = {
    val gs = DataLayout.rowGroupStats(spark, path, "a", "b")
    val total = gs.map(_._3).sum.toDouble
    val hit = gs.filter { case ((amin, amax), (bmin, bmax), _) =>
      amax >= aLo && amin <= aHi && bmax >= bLo && bmin <= bHi
    }.map(_._3).sum.toDouble
    assert(gs.size >= 80, s"need many row groups for the test to mean anything, got ${gs.size}")
    hit / total
  }

  test("z-order prunes a 2-D box where a single-column sort cannot") {
    val zPath = scratch("zorder") + "/z"
    val sPath = scratch("zorder-sorted") + "/s"
    DataLayout.zorderWrite(df,
      DataLayout.zvalue2(col("a"), 0, 199, col("b"), 0, 199),
      zPath, numFiles = 4, rowGroupBytes = 16 * 1024)
    // the control: perfectly sorted by a alone
    df.repartitionByRange(4, col("a")).sortWithinPartitions("a", "b")
      .write.mode("overwrite")
      .option("parquet.block.size", (16 * 1024).toString).parquet(sPath)

    val zFrac = intersectingRowFraction(zPath)
    val sFrac = intersectingRowFraction(sPath)
    // box is 1% of the plane; z-order should confine it to a few percent
    // of rows, the a-sort reads its full 10% a-stripe (b spans everything)
    info(f"z layout reads $zFrac%.4f of rows; a-sort control reads $sFrac%.4f")
    assert(zFrac < 0.06, s"z layout reads $zFrac of rows")
    assert(sFrac > 0.08, s"control should read its whole a-stripe, read $sFrac")
    assert(zFrac < sFrac / 2, s"z ($zFrac) should at least halve the sort control ($sFrac)")

    // the rewrite loses nothing
    assert(spark.read.parquet(zPath).count() === 200000)
    val got = spark.read.parquet(zPath)
      .filter(col("a").between(aLo, aHi) && col("b").between(bLo, bHi)).count()
    val want = df.filter(col("a").between(aLo, aHi) && col("b").between(bLo, bHi)).count()
    assert(got === want)

    // both predicates reach the reader — otherwise the stats never engage
    val scanned = spark.read.parquet(zPath)
      .filter(col("a").between(aLo, aHi) && col("b").between(bLo, bHi))
    val pushed = scanned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata("PushedFilters")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(a,") && pushed.contains("LessThanOrEqual(b,"),
      s"expected both box predicates pushed, got: $pushed")
  }

  test("compact: file count = ceil(bytes/target); rows byte-identical") {
    val frag = scratch("compact-frag")
    val out = scratch("compact-out")
    val docs = spark.read.parquet(testData("0.001") + "/documents.parquet")
    docs.repartition(32).write.mode("overwrite").parquet(frag)
    def pq(d: java.io.File): Seq[java.io.File] =
      if (d.isDirectory) d.listFiles().toSeq.flatMap(pq)
      else if (d.getName.endsWith(".parquet")) Seq(d) else Nil
    val bytes = pq(new java.io.File(frag)).map(_.length).sum
    val r = DataLayout.compact(spark, frag, out, targetBytes = bytes / 3 + 1)
    assert(r.filesBefore === 32)
    assert(r.filesAfter === math.ceil(bytes.toDouble / (bytes / 3 + 1)).toInt)
    assert(r.filesAfter < r.filesBefore)
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(out).orderBy("doc_id").collect().toSeq
    assert(a === b, "compaction changed rows")
  }

  test("compact with partition columns: one file per Hive directory") {
    import org.apache.spark.sql.functions.col
    val frag = scratch("compact-part-frag")
    val out = scratch("compact-part-out")
    val docs = spark.read.parquet(testData("0.001") + "/documents.parquet")
    docs.repartition(16).write.mode("overwrite")
      .partitionBy("lang").parquet(frag)
    val langDirs = new java.io.File(frag).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("lang="))
    assert(langDirs.forall(_.listFiles().count(_.getName.endsWith(".parquet")) > 1),
      "fixture zone not fragmented enough to test compaction")
    DataLayout.compact(spark, frag, out, targetBytes = 1L << 30,
      partitionCols = Seq("lang"))
    val outDirs = new java.io.File(out).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("lang="))
    assert(outDirs.map(_.getName).sorted === langDirs.map(_.getName).sorted)
    outDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) === 1,
        s"${d.getName} not compacted to one file")
    }
    val a = docs.select("doc_id", "text", "lang").orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(out).select("doc_id", "text", "lang")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("parquetBytes sizes through the dir's own filesystem: scheme-qualified paths and missing dirs") {
    val frag = scratch("pqbytes-frag")
    spark.read.parquet(testData("0.001") + "/documents.parquet")
      .repartition(4).write.mode("overwrite").parquet(frag)
    def pq(d: java.io.File): Seq[java.io.File] =
      if (d.isDirectory) d.listFiles().toSeq.flatMap(pq)
      else if (d.getName.endsWith(".parquet")) Seq(d) else Nil
    val localSum = pq(new java.io.File(frag)).map(_.length).sum
    assert(localSum > 0)
    // bare and scheme-qualified forms agree with the local listing — the
    // java.io.File sizing this replaces saw 0 bytes (null listFiles) for
    // any path its local view couldn't resolve
    assert(DataLayout.parquetBytes(spark, frag) === localSum)
    assert(DataLayout.parquetBytes(spark, s"file:$frag") === localSum)
    assert(DataLayout.parquetBytes(spark, s"$frag/never-written") === 0L)
  }

  test("compact on a nonexistent path fails with the friendly diagnostic, not a raw FS error") {
    // fs.listFiles throws FileNotFoundException before the require used to
    // be reached, so a mistyped zone path surfaced as an unrelated-looking
    // Hadoop error instead of the "holds no parquet files" contract message
    val ghost = s"${scratch("compact-ghost")}/never-written"
    val e = intercept[IllegalArgumentException] {
      DataLayout.compact(spark, ghost, scratch("compact-ghost-out"), 1L << 20)
    }
    assert(e.getMessage.contains("does not exist or holds no parquet files"))
  }
}
