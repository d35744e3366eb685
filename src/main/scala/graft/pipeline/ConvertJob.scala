package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PDF→pages conversion (reference
  * `pdf_converter/gen_pdf_imgLambda.py:25-69`): binaryFile scan of the raw
  * zone (S3), 1→N rasterize flatMap (G2/P14), page-image sink (K2).
  *
  * The rasterizer is a plain Scala UDF returning array<binary> followed by
  * posexplode — SURVEY §2.11's "simpler route" for generators: an opaque
  * render call gains nothing from a custom Catalyst Generator, and the
  * explode keeps one task per PDF, which is exactly the reference's
  * per-file Lambda parallelism generalized to a cluster.
  *
  * At scale: page bytes never shuffle — scan → project → explode → sink is
  * all narrow; each multi-MB JPEG stays inside the task that rendered it
  * (SURVEY §7.4 item 5).
  */
object ConvertJob {

  /** Raw-zone PDF source: binary files with pushdown-style path filtering
    * (F2 as a file-index predicate, not row filtering).
    */
  def readPdfs(spark: SparkSession, rawRoot: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf")
      .option("recursiveFileLookup", "true")
      .load(rawRoot)

  /** One row per page: (province, flyer, page_number, image). Path→column
    * extraction (P3) mirrors the reference's key parsing
    * (`gen_pdf_imgLambda.py:27-35`).
    */
  def pages(pdfs: DataFrame, rasterizer: PageRasterizer = StubRasterizer): DataFrame = {
    val rasterize = udf((bytes: Array[Byte]) => rasterizer.rasterize(bytes))
    val parts = split(col("path"), "/")
    pdfs
      .select(
        // "unknown" fallback for too-shallow paths, exactly the reference's
        // province fallback (`gen_pdf_imgLambda.py:32-35`) — a malformed
        // key must not become a literal "null" sink directory
        coalesce(try_element_at(parts, lit(-2)), lit("unknown")).as("province"),
        regexp_replace(try_element_at(parts, lit(-1)), "\\.pdf$", "").as("flyer"),
        posexplode(rasterize(col("content"))).as(Seq("page_idx", "image")))
      .select(
        col("province"), col("flyer"),
        (col("page_idx") + 1).cast("long").as("page_number"),
        col("image"))
  }

  /** Image sink (K2): one JPEG per page at
    * {interimRoot}/PnP/{province}/{flyer}/page_N.jpg
    * (`gen_pdf_imgLambda.py:58-60`), written from the executors — no
    * collect, no driver bottleneck.
    */
  def writeImages(pages: DataFrame, interimRoot: String): Unit = {
    import org.apache.spark.sql.Row
    val hconf = ExecutorFs.capture(pages.sparkSession)
    pages.select("province", "flyer", "page_number", "image")
      .foreachPartition { rows: Iterator[Row] =>
        // Hadoop FS, not java.nio: a scheme'd interim root must reach the
        // real filesystem, not a relative local path (see ExecutorFs)
        ExecutorFs.writeFiles(rows, hconf,
          r => if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2)) null
            else s"$interimRoot/PnP/${r.getString(0)}/${r.getString(1)}/page_${r.getLong(2)}.jpg",
          _.getAs[Array[Byte]](3))
      }
  }

  /** Full batch run: raw PDFs → page JPEGs on disk, returning the pages
    * frame for chaining. Cached before the sink (CropJob.run's discipline):
    * an uncached return would re-rasterize every PDF on each consumer
    * action AND re-list the raw zone, so files arriving between the write
    * and the consumption would appear in the frame with no JPEG on disk.
    * The refresh first drops any PRIOR run's cache entry over the same
    * path — the CacheManager matches by analyzed plan, not file mtimes.
    */
  def run(spark: SparkSession, rawRoot: String, interimRoot: String): DataFrame = {
    spark.catalog.refreshByPath(rawRoot)
    val p = pages(readPdfs(spark, rawRoot)).cache()
    writeImages(p, interimRoot)
    p
  }
}
