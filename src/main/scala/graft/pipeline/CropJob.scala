package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

import graft.functions.{BboxOps, ProductNormalize}

/** Product thumbnail cropping (reference
  * `cropper/pnp-cropperLambda.py:24-101`): page images ⋈ extracted products
  * on the derived page key (J1), bbox validity filter (F5), pad/clamp/scale
  * geometry (P11), javax.imageio crop (P13), sanitized crop filenames
  * (P12), crop-image sink (K5).
  *
  * Scale design: the JOIN BROADCASTS THE PRODUCT METADATA SIDE so the
  * multi-MB image payloads never shuffle (SURVEY §7.4 item 5 — join on
  * keys, not payloads); geometry is pure column math; only decode/crop is
  * a UDF.
  */
object CropJob {

  /** Interim-zone image source (S4): recursive binary glob, path-filtered
    * at the file index (F2).
    */
  def readImages(spark: SparkSession, interimRoot: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.jpg")
      .option("recursiveFileLookup", "true")
      .load(interimRoot)

  /** Pages with their derived join key {province}/{flyer}/{page_stem} —
    * the cropper reconstructs the same key from the JSON side
    * (`pnp-cropperLambda.py:26-34`).
    */
  def pagesWithKey(images: DataFrame): DataFrame = {
    val dims = udf((b: Array[Byte]) => ImageOps.decodeDims(b))
    val parts = split(col("path"), "/")
    images
      .select(col("content").as("image"),
        concat_ws("/",
          try_element_at(parts, lit(-3)),
          try_element_at(parts, lit(-2)),
          regexp_replace(try_element_at(parts, lit(-1)), "\\.(jpg|png)$", ""))
          .as("page_key"))
      .withColumn("_dims", dims(col("image")))
      .select(col("page_key"), col("image"),
        col("_dims._1").as("img_w"), col("_dims._2").as("img_h"))
  }

  /** Product rows with the same derived key and TRUE array indices
    * (G4/G5 via whole-file from_json + posexplode).
    */
  def productsWithKey(spark: SparkSession, silverGlob: String): DataFrame =
    productsFromRaw(
      spark.read.option("wholetext", "true").text(silverGlob)
        .withColumn("_src_path", input_file_name()))

  /** Same, over an already-read frame of (value: whole-file JSON text,
    * _src_path) rows — the shape a streaming micro-batch delivers.
    */
  def productsFromRaw(rawJson: DataFrame): DataFrame = {
    val parts = split(col("_src_path"), "/")
    rawJson
      .select(col("_src_path"),
        from_json(col("value"), ArrayType(ProductSchema.silver)).as("arr"))
      .select(col("_src_path"), posexplode(col("arr")).as(Seq("i", "p")))
      .filter(BboxOps.isValid(col("p.bounding_box")))
      .select(
        concat_ws("/",
          try_element_at(parts, lit(-3)),
          try_element_at(parts, lit(-2)),
          regexp_replace(try_element_at(parts, lit(-1)), "\\.json$", ""))
          .as("page_key"),
        col("i"),
        col("p.product_name").as("product_name"),
        col("p.bounding_box").as("bbox"))
  }

  /** The crop frame: one row per (page, product) with the cropped JPEG and
    * its metadata. Geometry (P11) is column math; only the pixel work is a
    * UDF. Product metadata is broadcast so image bytes stay put.
    */
  def crops(pages: DataFrame, products: DataFrame): DataFrame = {
    val cropUdf = udf((img: Array[Byte], l: Double, t: Double, r: Double, b: Double) =>
      ImageOps.cropJpeg(img, l, t, r, b))
    val padded = BboxOps.padClamp(col("bbox"))
    val px = BboxOps.toPixels(padded, col("img_w").cast("double"), col("img_h").cast("double"))
    // fall back to product_<i> only when the name is ABSENT (null): the
    // reference's `.get("product_name", f"product_{i}")` defaults only on
    // a missing key, and its sanitizer has no falsiness check — an
    // all-special name ("???") sanitizes to "" and the reference emits
    // the degenerate "<i>_.jpg" (pnp-cropperLambda.py:88-92). The oracle
    // twins (productCropsSql / cropSpecSql) coalesce on NULL only; this
    // must stay bit-identical to them.
    val sanitized = ProductNormalize.sanitizeFilename(col("product_name"))
    val name = coalesce(sanitized, concat(lit("product_"), col("i").cast("string")))
    val dims = udf((b: Array[Byte]) => ImageOps.decodeDims(b))
    pages.join(broadcast(products), Seq("page_key"))
      .withColumn("_px", px)
      .withColumn("crop",
        cropUdf(col("image"), col("_px.left"), col("_px.top"),
          col("_px.right"), col("_px.bottom")))
      .filter(col("crop").isNotNull)
      .withColumn("crop_file",
        concat(col("i").cast("string"), lit("_"), name, lit(".jpg")))
      .withColumn("_cdims", dims(col("crop")))
      .select(col("page_key"), col("i").cast("long").as("i"),
        col("product_name"), col("crop_file"), col("crop"),
        col("_cdims._1").as("crop_w"), col("_cdims._2").as("crop_h"))
  }

  /** Crop sink (K5): {shrRoot}/PnP/{page_key}/{i}_{name}.jpg
    * (`pnp-cropperLambda.py:92-94`), written from the executors.
    */
  def writeCrops(crops: DataFrame, shrRoot: String): Unit = {
    import org.apache.spark.sql.Row
    val hconf = ExecutorFs.capture(crops.sparkSession)
    crops.select("page_key", "crop_file", "crop")
      .foreachPartition { rows: Iterator[Row] =>
        // Hadoop FS, not java.nio: a scheme'd shr root must reach the
        // real filesystem, not a relative local path (see ExecutorFs)
        ExecutorFs.writeFiles(rows, hconf,
          r => if (r.isNullAt(0) || r.isNullAt(1)) null
            else s"$shrRoot/PnP/${r.getString(0)}/${r.getString(1)}",
          _.getAs[Array[Byte]](2))
      }
  }

  /** Full batch run: interim images ⋈ silver products → crop files on disk,
    * returning the crops frame for chaining. The frame is cached before the
    * sink so a caller consuming it doesn't re-decode and re-crop every
    * image a second time (at larger scale, chain from the written files
    * instead and skip the returned frame).
    */
  def run(spark: SparkSession, interimRoot: String, silverGlob: String,
          shrRoot: String): DataFrame = {
    // Drop any cache entries over the input zones first: Spark's
    // CacheManager matches by ANALYZED PLAN, not file mtimes, so a
    // previous run's cached crops frame (identical plan, same paths)
    // would otherwise serve the OLD zone contents to a re-run after new
    // images/JSON landed — the stale-cache class a photo-vs-stub fixture
    // mix-up exposed (see BinaryPipeline's photo zones).
    spark.catalog.refreshByPath(interimRoot)
    // refreshByPath matches cache entries by PATH COMPONENT (isSubDir), so
    // the refreshed prefix must be a directory: truncate the glob at its
    // first wildcard, then back off to the last '/' — a glob like
    // `.../part-*.json` must refresh `.../` (the dir), not the dangling
    // `.../part-` fragment, which matches nothing and no-ops silently.
    val fixedPrefix = silverGlob.takeWhile(c => !"*?[{".contains(c))
    // a RELATIVE glob whose fixed prefix has no '/' (e.g. "data*.json")
    // would otherwise truncate to a bogus one-character path that matches
    // no cache entry and no-ops silently — refresh the working directory
    // (the base such a glob resolves against) so the stale-cache guard
    // still bites
    val cut = fixedPrefix.lastIndexOf('/')
    spark.catalog.refreshByPath(
      if (cut < 0) "." else fixedPrefix.substring(0, math.max(cut, 1)))
    val c = crops(pagesWithKey(readImages(spark, interimRoot)),
      productsWithKey(spark, silverGlob)).cache()
    writeCrops(c, shrRoot)
    c
  }
}
