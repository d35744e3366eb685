package graft.pipeline

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.Row

/** Executor-side file sink shared by the four binary writers (raw PDFs,
  * page JPEGs, silver JSON, crop JPEGs): one file per row, written through
  * the destination path's OWN Hadoop filesystem.
  *
  * Why not java.nio: `Paths.get("hdfs://nn/zone/…")` is a RELATIVE local
  * path (`hdfs:` becomes a path segment), so on a scheme-qualified root
  * every executor would "successfully" write into its task working
  * directory and the job would report success while the real zone stays
  * empty — end-to-end silent row loss, the same hazard class the
  * export-zone metadata port closed driver-side. The Hadoop `Path`/
  * `FileSystem` route resolves `file:`, `hdfs://`, `s3a://` uniformly, and
  * `FileSystem.create` creates parent directories itself.
  *
  * Executor-side configuration: tasks cannot reach the driver's
  * SparkSession, so the filesystem resolves from a bare `Configuration`,
  * which loads the cluster's site files (core-site.xml etc.) from the
  * executor classpath — the standard executor-side FS access pattern; on
  * local[*] it resolves to the local filesystem exactly like java.nio did.
  * The FileSystem handle is resolved once per partition (it is the
  * per-scheme cached instance, not per-row work).
  */
private[pipeline] object ExecutorFs {

  /** Write `bytesOf(row)` at `pathOf(row)` for every row of one partition.
    * `pathOf` returning null means a key column the path interpolates was
    * null (callers map null components to a null path) — fail the task
    * loudly rather than writing a file literally named "null" that no
    * downstream glob will ever match.
    */
  def writeFiles(rows: Iterator[Row], pathOf: Row => String,
      bytesOf: Row => Array[Byte]): Unit = {
    val conf = new Configuration()
    var fs: FileSystem = null
    rows.foreach { r =>
      val raw = pathOf(r)
      require(raw != null,
        "binary sink got a null-derived path - an upstream key column " +
          "(province/date/page/file) was null; such rows must be filtered " +
          "or quarantined before the sink")
      val p = new Path(raw)
      if (fs == null) fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      try out.write(bytesOf(r)) finally out.close()
    }
  }
}
