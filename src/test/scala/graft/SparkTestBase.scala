package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (SparkSession.builder is
  * a process-wide singleton anyway); warehouse + temp dirs under target/.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // same extensions surface as Verify/Bench/GraftSession: native
      // functions + the interval-join rewrite rule are active in every
      // suite, so a rule regression surfaces anywhere it matters
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.warehouse.dir", "/root/repo/target/test-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSpark.spark

  /** The driver-generated fixture root (TESTDATA.md) at a scale factor —
    * specs name fixtures through this so a relocation is one edit here,
    * not a sweep over hardcoded paths.
    */
  def testData(sf: String): String = s"/root/testdata/sf$sf"
  /** Unique scratch dir per suite under target/. */
  def scratch(name: String): String = {
    val dir = s"/root/repo/target/test-scratch/$name"
    graft.core.FsUtil.deleteRecursively(dir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    dir
  }

  /** Recursive (path, length, mtime) fingerprint of every file under
    * `dir`, listed through the path's OWN Hadoop FileSystem (so it works
    * on scheme-qualified dirs) — the memo-hit proofs in the index specs
    * assert this is bit-unchanged across a repeat build.
    */
  def fsFingerprint(dir: String): Seq[(String, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    val b = Seq.newBuilder[(String, Long, Long)]
    while (it.hasNext) {
      val f = it.next()
      b += ((f.getPath.toString, f.getLen, f.getModificationTime))
    }
    b.result().sortBy(_._1)
  }
}
