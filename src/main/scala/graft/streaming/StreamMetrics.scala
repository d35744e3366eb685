package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-micro-batch observability for the stateful streams: a
  * [[StreamingQueryListener]] that captures, for every progress event, the
  * batch's input volume, the trigger's duration breakdown (addBatch =
  * plan+execute, the state-store commit walls, offset log writes), and the
  * state operators' row/byte footprint. This is the evidence layer behind
  * SCALING.md's streaming section: wall-clock alone can't distinguish "the
  * operator got slower" from "the box was loaded" or "state grew" — the
  * breakdown can, because state rows/bytes and per-phase durations are
  * load-independent facts about the execution.
  *
  * Usage: `val m = StreamMetrics.attach(spark)` before starting queries,
  * `m.detach()` after they terminate; `m.batches` / `m.jsonLines` to read.
  */
final class StreamMetrics private (spark: SparkSession) {
  import StreamMetrics.Batch

  private val buf = ArrayBuffer.empty[Batch]

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val st = p.stateOperators
      val b = Batch(
        query = p.name,
        batchId = p.batchId,
        inputRows = p.numInputRows,
        durationMs = {
          val m = p.durationMs
          if (m == null) Map.empty
          else {
            val it = m.entrySet().iterator()
            val out = Map.newBuilder[String, Long]
            while (it.hasNext) { val kv = it.next(); out += kv.getKey -> kv.getValue.longValue() }
            out.result()
          }
        },
        stateRowsTotal = st.map(_.numRowsTotal).sum,
        stateRowsUpdated = st.map(_.numRowsUpdated).sum,
        stateRowsRemoved = st.map(_.numRowsRemoved).sum,
        stateBytes = st.map(_.memoryUsedBytes).sum)
      buf.synchronized { buf += b }
    }
  }

  def detach(): Unit = spark.streams.removeListener(listener)

  def batches: Seq[Batch] = buf.synchronized { buf.toVector }

  /** Batches for one query name (progress events interleave across the
    * concurrently-running queries of a DAG).
    */
  def batchesFor(query: String): Seq[Batch] = batches.filter(_.query == query)

  def jsonLines: Seq[String] = batches.map { b =>
    val dur = b.durationMs.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    s"""{"query":"${b.query}","batch":${b.batchId},"input_rows":${b.inputRows},""" +
      s""""duration_ms":$dur,"state_rows":${b.stateRowsTotal},""" +
      s""""state_rows_updated":${b.stateRowsUpdated},"state_rows_removed":${b.stateRowsRemoved},""" +
      s""""state_bytes":${b.stateBytes}}"""
  }
}

object StreamMetrics {

  final case class Batch(
      query: String,
      batchId: Long,
      inputRows: Long,
      durationMs: Map[String, Long],
      stateRowsTotal: Long,
      stateRowsUpdated: Long,
      stateRowsRemoved: Long,
      stateBytes: Long)

  def attach(spark: SparkSession): StreamMetrics = {
    val m = new StreamMetrics(spark)
    spark.streams.addListener(m.listener)
    m
  }
}
