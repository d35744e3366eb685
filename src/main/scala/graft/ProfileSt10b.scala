package graft

// TEMPORARY profiling main — not part of the library surface; deleted
// before the round closes.
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

object ProfileSt10b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("profile-st10b")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val so = p.stateOperators
        val soStr = so.map(s =>
          s"rowsTotal=${s.numRowsTotal} upd=${s.numRowsUpdated} " +
          s"commitMs=${s.commitTimeMs}").mkString("; ")
        println(s"BATCH ${p.batchId}: rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs} state[$soStr]")
      }
    })
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.queries.EventStreaming.streamKeyedRangeCorrelation(spark, dir)
      val n = df.count()
      val t1 = System.nanoTime()
      println(f"RUN $i: rows=$n wall=${(t1 - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
