package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ProductNormalize

/** The scraper's RELATIONAL surface (reference
  * `scraper/pnpscrLambda.py:85-130`) as DataFrame transforms over a scraped
  * link table: link filtering (F1), date-slug/province derivation (P1/P2),
  * raw-zone key convention (K1), and the URL dedup-then-rejoin (J2) that
  * fetches each distinct PDF once and fans the bytes back out to every
  * (province, date_slug) target.
  *
  * The browser itself (Playwright DOM scan) stays OUTSIDE the engine as a
  * thin feeder per SURVEY §2.1 S1 — the engine starts at the link table,
  * which is exactly the data the DOM scan emits.
  */
object ScrapeFeeder {

  /** Scraped-link schema: one row per `<a>` inside a `div.pdfdownload`
    * container — (date_text, province_text, href).
    */
  def readLinks(spark: SparkSession, linksGlob: String): DataFrame =
    spark.read
      .schema("date_text STRING, province_text STRING, href STRING")
      .option("multiLine", "true")
      .json(linksGlob)

  /** F1 + P1 + P2: keep rows with a non-null href containing ".pdf"
    * (case-insensitive) whose province is not the "Shop now" pseudo-link
    * (`pnpscrLambda.py:107-108`), deriving the sanitized (province,
    * date_slug) key.
    *
    * Both key components must be NON-NULL, checked explicitly: a null
    * province previously fell out only by three-valued-logic accident
    * (`!null.contains(...)` is null), while a null date_text SURVIVED and
    * null-propagated through fetchPlan's `concat` into a NULL target_key —
    * which the raw sink would have interpolated into a file literally
    * named "null" (overwritten per such row, invisible to the `*.pdf`
    * glob: the catalogue silently vanished). A link row without a
    * derivable key has no raw-zone destination; it is dropped here, by
    * stated contract, and the sink independently refuses null keys.
    */
  def catalogueLinks(links: DataFrame): DataFrame =
    links
      .select(
        ProductNormalize.provinceFromLink(col("province_text")).as("province"),
        ProductNormalize.dateSlug(col("date_text")).as("date_slug"),
        col("href"))
      .filter(col("href").isNotNull &&
        lower(col("href")).contains(".pdf") &&
        col("province").isNotNull && col("date_slug").isNotNull &&
        !col("province").contains("Shop_now"))

  /** J2 + K1: the fetch plan. Each distinct href is downloaded exactly once
    * (is_primary = first target by (province, date_slug) — deterministic,
    * where the reference uses DOM order); every target row carries its
    * raw-zone destination key (`pnpscrLambda.py:110`). An HTTP-fetch stage
    * would run over the is_primary rows only (mapPartitions with a pooled
    * client, S2), then rejoin bytes to all targets on href.
    */
  def fetchPlan(links: DataFrame): DataFrame = {
    val w = Window.partitionBy("href").orderBy("province", "date_slug")
    catalogueLinks(links)
      .withColumn("is_primary", row_number().over(w) === 1)
      .withColumn("target_key",
        concat(lit("data/raw/PnP/"), col("province"), lit("/"),
          col("date_slug"), lit(".pdf")))
      .select("province", "date_slug", "href", "is_primary", "target_key")
  }
}
