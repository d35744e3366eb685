package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning — the lakehouse
  * OPTIMIZE/Z-ORDER move (public literature: Morton-order space-filling
  * curves; Delta Lake's OPTIMIZE ZORDER BY): rewrite a table so rows close
  * in a multi-column key space land in the same parquet row groups, which
  * turns the reader's min/max statistics into effective pruning for
  * predicates over ANY of the z-ordered columns at once.
  *
  * Why not just sort? A single-column sort clusters that column perfectly
  * and leaves every other column's per-row-group range spanning the whole
  * table — a 2-D box predicate prunes on one dimension and reads
  * everything else. Bit-interleaving the dimensions bounds EVERY
  * dimension's spread within a run of consecutive z-values, so each row
  * group covers a small hyper-rectangle and a selective box predicate
  * skips most of the file without opening it.
  *
  * Results are layout-independent — l1's gate runs the same filter through
  * DuckDB over the ORIGINAL table and hash-compares — and the pruning
  * claim is checked structurally (DataLayoutSpec reads the parquet footers
  * the same way the reader's row-group filter does).
  *
  * Scale shape: the rewrite is one range-repartition by z-value (a sample
  * pass + one full shuffle — the same cost as any global sort, paid once,
  * amortized over every subsequent scan), and the write is embarrassingly
  * parallel. At 100 TB this runs as a per-partition maintenance job, not
  * one global rewrite.
  */
object DataLayout {

  /** 32-bit Morton code of two columns, each first normalized to a 16-bit
    * rank within [lo, hi] (driver-known bounds: table min/max — metadata,
    * not data). Pure column arithmetic — codegen'd, no UDF.
    */
  def zvalue2(a: Column, aLo: Double, aHi: Double,
      b: Column, bLo: Double, bHi: Double): Column = {
    def rank16(c: Column, lo: Double, hi: Double): Column =
      least(lit(65535), greatest(lit(0),
        floor((c.cast("double") - lit(lo)) / lit(math.max(hi - lo, 1e-300)) * lit(65536.0))
          .cast("long")))
    val (ra, rb) = (rank16(a, aLo, aHi), rank16(b, bLo, bHi))
    (0 until 16).map { i =>
      val abit = shiftleft(shiftright(ra, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val bbit = shiftleft(shiftright(rb, i).bitwiseAND(lit(1L)), 2 * i)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` z-ordered by the given 32-bit z-value column: range
    * repartition so each output file owns a contiguous z-range, sort
    * within, and write with small row groups so the min/max granularity
    * matches the target scan selectivity. `rowGroupBytes` is the pruning
    * granule: smaller groups prune tighter and cost more footer entries
    * (parquet's usual trade).
    */
  def zorderWrite(df: DataFrame, z: Column, path: String,
      numFiles: Int, rowGroupBytes: Long): Unit = {
    // INT96 timestamps (the legacy default) carry NO min/max statistics
    // and the reader disables predicate pushdown on them — an
    // INT96-timestamped layout silently defeats the entire point of the
    // rewrite. Pin TIMESTAMP_MICROS for the write, restore after.
    val spark = df.sparkSession
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Per-row-group (min, max, rows) of two INT64 columns, straight from
    * the parquet footers — exactly the statistics the reader's row-group
    * filter consults, so "stats disjoint from the predicate box" IS
    * "row group never read".
    */
  def rowGroupStats(spark: org.apache.spark.sql.SparkSession, path: String,
      colA: String, colB: String): Seq[((Long, Long), (Long, Long), Long)] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(conf)
    val files = fs.listStatus(new Path(path))
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    files.toSeq.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try {
        import scala.jdk.CollectionConverters._
        reader.getFooter.getBlocks.asScala.toSeq.map { bl =>
          def mm(name: String): (Long, Long) = {
            val cc = bl.getColumns.asScala
              .find(_.getPath.toDotString == name).get
            val st = cc.getStatistics
            // a null min/max (e.g. an INT96 column) means the reader
            // cannot prune this group either — surface it loudly rather
            // than report a pruning capability the scan doesn't have
            require(st != null && st.genericGetMin != null && st.genericGetMax != null,
              s"column $name carries no row-group statistics (INT96 timestamp?)")
            (st.genericGetMin.asInstanceOf[Number].longValue(),
              st.genericGetMax.asInstanceOf[Number].longValue())
          }
          (mm(colA), mm(colB), bl.getRowCount)
        }
      } finally reader.close()
    }
  }

  final case class CompactionReport(
    filesBefore: Int, bytesBefore: Long, filesAfter: Int)

  /** Small-file COMPACTION — the lakehouse OPTIMIZE maintenance pass: a
    * zone accreted through many incremental writes (streaming
    * micro-batches, per-delivery dynamic-overwrite merges, x4-style
    * targeted rewrites) degenerates into thousands of tiny files whose
    * per-file open/footer/seek cost comes to dominate every scan; this
    * rewrites it into ~`targetBytes`-sized files without changing a row.
    *
    * File count is computed from the DRIVER-side file listing (sizes and
    * counts — metadata, never data): n = ceil(bytes / targetBytes). The
    * rewrite is one shuffle of the zone. With `partitionCols` the
    * repartition hashes on exactly those columns, so each partition
    * value's rows land in ONE task → one file per Hive directory (a
    * skewed value still caps per-file rows via `maxRecordsPerFile`);
    * without, a plain round-robin repartition gives n near-equal files.
    * At 100 TB this runs per-partition (compact yesterday's directories),
    * not as one global rewrite — same amortization contract as the
    * z-order pass above.
    */
  // list through the Hadoop FileSystem (like rowGroupStats), not
  // java.io.File: a scheme-qualified or non-local zoneDir (file:, hdfs:,
  // s3a:) is readable by spark.read but invisible to File, which would
  // silently size the rewrite from bytes=0 -> one giant output partition
  private def parquetFiles(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // a nonexistent path must fall through to the caller's friendly
    // require (the mistyped-path case), not surface as a raw Hadoop
    // FileNotFoundException from listFiles
    if (!fs.exists(p)) return Seq.empty
    val it = fs.listFiles(p, true)
    val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) out += f
    }
    out.result()
  }

  /** Total parquet bytes under `dir` (recursive), via the dir's own Hadoop
    * filesystem — the sizing input callers need to pick a `targetBytes`
    * relative to the zone (e.g. Layout's quarter-of-zone fixture target)
    * without reaching for `java.io.File`, which on a scheme-qualified or
    * non-local zone sees nothing and silently sizes the rewrite from 0.
    * A missing dir returns 0 (the caller's emptiness handling applies).
    */
  def parquetBytes(spark: org.apache.spark.sql.SparkSession, dir: String): Long =
    parquetFiles(spark, dir).map(_.getLen).sum

  def compact(spark: org.apache.spark.sql.SparkSession, zoneDir: String,
      outDir: String, targetBytes: Long,
      partitionCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L): CompactionReport = {
    val before = parquetFiles(spark, zoneDir)
    require(before.nonEmpty,
      s"compact target $zoneDir does not exist or holds no parquet files")
    val bytes = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(zoneDir)
    val staged =
      if (partitionCols.isEmpty) df.repartition(n)
      else df.repartition(n, partitionCols.map(org.apache.spark.sql.functions.col): _*)
    val w = staged.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
    val w2 = if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile) else w
    (if (partitionCols.isEmpty) w2 else w2.partitionBy(partitionCols: _*))
      .parquet(outDir)
    CompactionReport(before.size, bytes,
      parquetFiles(spark, outDir).size)
  }
}
