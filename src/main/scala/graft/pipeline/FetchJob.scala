package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** HTTP fetch (S2) + raw PDF sink (K1), engine-side: the download plan from
  * [[ScrapeFeeder.fetchPlan]] runs through `mapPartitions` with ONE client
  * per partition (connection reuse — the distributed analog of the
  * reference's single `requests.Session`, `scraper/pnpscrLambda.py:89-92`),
  * then primary fetches fan back out to every (province, date_slug) copy
  * target (J2's rejoin) and land at the raw-zone key convention
  * (`pnpscrLambda.py:110`).
  *
  * The HTTP client is pluggable ([[UrlFetcher]]) — this environment has no
  * egress, so tests use a deterministic stub; a real impl is a thin
  * java.net.http wrapper with the same one-instance-per-partition lifecycle.
  */
trait UrlFetcher extends Serializable {
  /** Fetch one URL → body bytes, or None on failure (the reference logs and
    * skips failed downloads, `pnpscrLambda.py:143-144`).
    */
  def fetch(url: String): Option[Array[Byte]]
}

/** Deterministic stub: "fetches" a minimal 2-page PDF whose bytes embed the
  * URL (so tests can assert which fetch produced which file).
  */
class StubFetcher extends UrlFetcher {
  override def fetch(url: String): Option[Array[Byte]] =
    Some(FixtureBinaries.minimalPdf(2) ++ s"\n%src: $url\n".getBytes("UTF-8"))
}

object FetchJob {

  /** Download each primary URL once (S2), rejoin bytes to all copy targets
    * (J2): one row per (province, date_slug) with the fetched PDF. The
    * BROADCAST side is the plan metadata (href/province/date_slug/target_key
    * strings — tiny), never the fetched bytes: payloads stay in the fetching
    * task's partition, honoring the repo-wide rule that binary content is
    * never shuffled or broadcast. Failures drop out like the reference's
    * try/except-continue.
    */
  def fetchAll(plan: DataFrame, fetcher: UrlFetcher): DataFrame = {
    import plan.sparkSession.implicits._
    val fetched = plan.filter(col("is_primary")).select("href")
      .as[String]
      .mapPartitions { urls =>
        // one fetcher per partition = one client/session per task
        val client = fetcher
        urls.flatMap(u => client.fetch(u).map(b => (u, b)))
      }
      .toDF("href", "content")
    fetched.join(
      broadcast(plan.select("province", "date_slug", "href", "target_key")),
      Seq("href"))
      .select("province", "date_slug", "href", "target_key", "content")
  }

  /** K1: write each fetched PDF at its raw-zone key, from the executors —
    * through the root's own Hadoop filesystem (see [[ExecutorFs]]; a
    * java.nio path here silently writes a scheme'd root into the task's
    * working directory). A null target_key fails the task loudly: it means
    * the plan's (province, date_slug) derivation produced null, and the
    * old interpolation wrote the PDF to a file literally named "null".
    */
  def writeRaw(fetched: DataFrame, rawRootParent: String): Unit = {
    // driver-side conf snapshot: executors must resolve the root with the
    // session's spark.hadoop.* / fs.defaultFS, not bare classpath defaults
    val hconf = ExecutorFs.capture(fetched.sparkSession)
    fetched.select("target_key", "content")
      .foreachPartition { rows: Iterator[Row] =>
        ExecutorFs.writeFiles(rows, hconf,
          r => if (r.isNullAt(0)) null else s"$rawRootParent/${r.getString(0)}",
          _.getAs[Array[Byte]](1))
      }
  }
}
