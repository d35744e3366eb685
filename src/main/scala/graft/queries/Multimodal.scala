package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal (binary) column plumbing — image/audio/video as opaque
  * `BinaryType` payloads with typed metadata, the shape the reference's
  * early zones use for PDFs/JPEGs (SURVEY §1.2: binary is a first-class
  * payload, `gen_pdf_imgLambda.py:51-63`, `pnp-cropperLambda.py:50-52`).
  *
  * The real binary ingestion/decode path (binaryFile sources, the
  * javax.imageio crop UDF, the stubbed PDF rasterizer) lives in
  * graft.pipeline.{ConvertJob, CropJob}; HERE we exercise the Spark-side
  * plumbing that must be exact at scale —
  * binary encode, byte-length/digest metadata extraction, header slicing and
  * fixed-stride frame sampling — as oracle-checked column expressions. The
  * synthetic payload is the document text encoded as UTF-8, so DuckDB
  * reproduces the same bytes.
  *
  * Scale note: metadata extraction never moves payloads between executors —
  * every operation is a projection on the scan; only the (tiny) metadata
  * columns would ever reach a shuffle (SURVEY §7.4 hard part 5).
  */
object Multimodal {

  private def assets(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id").as("asset_id"), encode(col("text"), "UTF-8").as("media"))

  /** Binary metadata extraction: size, digest, magic-header hex. */
  def binaryMetadata(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir)
      .select(
        col("asset_id"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("content_md5"),
        lower(hex(substring(col("media"), 1, 8))).as("header_hex"))
      .orderBy("asset_id")

  // DuckDB has no BLOB substring/md5, so the oracle works on chars; the
  // synthetic text is ASCII, where byte and char slices coincide.
  val binaryMetadataSql: String =
    """SELECT doc_id AS asset_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_md5,
      |  lower(hex(substring(text, 1, 8))) AS header_hex
      |FROM documents
      |ORDER BY asset_id""".stripMargin

  /** Fixed-stride frame sampling: one row per 64-byte "frame" of the
    * payload (the video-frame-sample shape: 1 asset → N frames, a pure
    * generator like the reference's PDF→pages fan-out, SURVEY G2).
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir)
      .withColumn("n_bytes", length(col("media")).cast("long"))
      .select(col("asset_id"), col("n_bytes"), col("media"),
        posexplode(expr(
          "transform(sequence(0, CAST(greatest(ceil(length(media) / 64.0) - 1, 0) AS INT)), " +
            "i -> i * 64)")).as(Seq("frame_idx", "offset")))
      .select(
        col("asset_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        col("offset").cast("long").as("offset"),
        lower(hex(expr("substring(media, offset + 1, 16)"))).as("frame_header"))
      .orderBy("asset_id", "frame_idx")

  val frameSampleSql: String =
    """SELECT doc_id AS asset_id,
      |  CAST(i AS BIGINT) AS frame_idx,
      |  CAST(i * 64 AS BIGINT) AS offset,
      |  lower(hex(substring(text, CAST(i * 64 + 1 AS INT), 16))) AS frame_header
      |FROM documents,
      |  LATERAL unnest(generate_series(0,
      |    CAST(greatest(ceil(octet_length(encode(text)) / 64.0) - 1, 0) AS BIGINT))) t(i)
      |ORDER BY asset_id, frame_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_metadata" -> (binaryMetadata _),
    "m2_frame_sample" -> (frameSample _))

  val oracles: Map[String, String] = Map(
    "m1_binary_metadata" -> binaryMetadataSql,
    "m2_frame_sample" -> frameSampleSql)
}
