package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-call batch orchestration of the whole reference DAG (E1/E3): every
  * Lambda/S3-event boundary collapses into chained DataFrame jobs over the
  * medallion zones. Streaming orchestration of the same stages lives in
  * graft.streaming.PipelineStreams.
  */
object Pipeline {

  /** Zone roots, mirroring the reference's layout
    * (`gen_pdf_img.py:10-12`: raw → interim → pro/silver → clean → shr).
    */
  final case class Zones(root: String) {
    val raw = s"$root/data/raw"
    val interim = s"$root/data/interim/images"
    val silver = s"$root/data/pro/json"
    val silverGlob = s"$silver/PnP/*/*/*.json"
    val clean = s"$root/data/clean/PnP"
    val shr = s"$root/data/shr/products"
  }

  /** Full batch run from a scraped link table:
    * fetch PDFs → rasterize pages → extract products → clean table → crops.
    * Returns the clean-zone frame (the queryable product table).
    */
  def runAll(spark: SparkSession, links: DataFrame, zones: Zones,
             fetcher: UrlFetcher = new StubFetcher,
             extractor: VisionExtractor = new FixtureExtractor()): DataFrame = {
    FetchJob.writeRaw(FetchJob.fetchAll(ScrapeFeeder.fetchPlan(links), fetcher), zones.root)
    ConvertJob.run(spark, zones.raw, zones.interim)
    val pages = CropJob.pagesWithKey(CropJob.readImages(spark, zones.interim))
    ExtractJob.writeSilver(ExtractJob.extract(pages, extractor), zones.silver)
    val clean = CleanJob.run(spark, zones.silverGlob, zones.clean)
    CropJob.run(spark, zones.interim, zones.silverGlob, zones.shr)
    clean
  }
}
