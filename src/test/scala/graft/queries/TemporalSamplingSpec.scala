package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Plan-shape and semantics tests for the temporal joins and the
  * sampling/sharding operators: the whole point of these formulations is
  * WHICH physical plan they produce — a result-correct nested-loop variant
  * would fail at scale, so the shape is asserted, not assumed.
  */
class TemporalSamplingSpec extends SparkTestBase {

  private lazy val Sf = testData("0.001")

  test("as-of join compiles to shuffle+window, never a nested-loop join (j1)") {
    val df = Temporal.asofAttribution(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"as-of join must not plan a quadratic join:\n$plan")
    assert(plan.contains("Window"), "expected the running-window formulation")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every attribution is a strictly-earlier trigger event of the right type
    assert(rows.forall(_.getAs[Long]("lag_seconds") >= 0))
    assert(rows.forall(r => Set("view", "click")(r.getAs[String]("attributed_type"))))
    // one row per purchase at most (as-of joins never fan out)
    val ids = rows.map(_.getAs[Long]("purchase_id"))
    assert(ids.distinct.length === ids.length)
  }

  test("as-of join matches the per-purchase argmax definition (j1)") {
    val ev = graft.core.Tables(spark, Sf).events
      .select("event_id", "user_id", "ts", "event_type").collect()
    val triggers = ev.filter(r => Set("view", "click")(r.getAs[String]("event_type")))
    val expected = ev.filter(_.getAs[String]("event_type") == "purchase").flatMap { p =>
      val before = triggers.filter(t =>
        t.getAs[Long]("user_id") == p.getAs[Long]("user_id") &&
          t.getAs[java.sql.Timestamp]("ts").getTime < p.getAs[java.sql.Timestamp]("ts").getTime)
      if (before.isEmpty) None
      else {
        val best = before.maxBy(_.getAs[java.sql.Timestamp]("ts").getTime)
        Some(p.getAs[Long]("event_id") -> best.getAs[Long]("event_id"))
      }
    }.toMap
    val got = Temporal.asofAttribution(spark, Sf).collect()
      .map(r => r.getAs[Long]("purchase_id") -> r.getAs[Long]("attributed_id")).toMap
    assert(got === expected)
  }

  test("bounded range join is a bucket equi-join and finds exactly the close pairs (j2)") {
    val df = Temporal.rangeCorrelation(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must bucket, not nest:\n$plan")
    // brute-force reference on the tiny sf
    val ev = graft.core.Tables(spark, Sf).events
      .select("event_id", "ts", "event_type").collect()
    def us(r: org.apache.spark.sql.Row) =
      r.getAs[java.sql.Timestamp]("ts").getTime * 1000L +
        (r.getAs[java.sql.Timestamp]("ts").getNanos / 1000L) % 1000L
    val p = ev.filter(_.getAs[String]("event_type") == "purchase")
    val e = ev.filter(_.getAs[String]("event_type") == "error")
    val expected = (for {
      a <- p; b <- e if math.abs(us(a) - us(b)) <= 60000000L
    } yield (a.getAs[Long]("event_id"), b.getAs[Long]("event_id"))).toSet
    val got = df.collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("error_id"))).toSet
    assert(got === expected)
  }

  test("streaming as-of join equals the batch as-of join on replay (st5 == j1)") {
    val batch = Temporal.asofAttribution(spark, Sf).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("attributed_id"),
        r.getAs[Long]("lag_seconds"))).sorted
    val streamed = EventStreaming.streamAttribution(spark, Sf).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("attributed_id"),
        r.getAs[Long]("lag_seconds"))).sorted
    assert(streamed.toSeq === batch.toSeq)
  }

  test("hash sample is deterministic and a pure pushed-down filter (t7)") {
    val a = Sampling.hashSample(spark, Sf).collect().map(_.getAs[Long]("doc_id"))
    val b = Sampling.hashSample(spark, Sf).collect().map(_.getAs[Long]("doc_id"))
    assert(a.sameElements(b), "re-running the sample must reproduce it exactly")
    val plan = Sampling.hashSample(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.contains("rangepartitioning"),
      s"sampling must not shuffle (only the final sort may):\n$plan")
  }

  test("stratified sample is deterministic and actually downsamples the heavy stratum (t10)") {
    val a = Sampling.stratifiedSample(spark, Sf).collect()
    val b = Sampling.stratifiedSample(spark, Sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    val docs = graft.core.Tables(spark, Sf).documents
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val kept = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length.toLong).toMap
    // en keeps ~5%, others ≥20%: the en keep-RATE must be well below the rest
    val enRate = kept.getOrElse("en", 0L).toDouble / docs("en")
    val restKept = (kept - "en").values.sum.toDouble
    val restTotal = (docs - "en").values.sum.toDouble
    assert(enRate < restKept / restTotal,
      s"en rate $enRate not below rest ${restKept / restTotal}")
  }

  test("doc chunking covers every token, overlaps by stride, and never shuffles (t15)") {
    val c = Sampling.ChunkTokens.toInt
    val s = Sampling.ChunkStride.toInt
    val docs = graft.core.Tables(spark, Sf).documents
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1))
      .toMap
    val df = Sampling.docChunks(spark, Sf)
    val got = df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
      r.getAs[Long]("start_tok"), r.getAs[Long]("n_tok"), r.getAs[String]("chunk_text")))
    // every chunk is exactly the tokens [start, start+n_tok) of its doc
    got.foreach { case (id, _, start, n, text) =>
      val toks = docs(id)
      assert(text === toks.slice(start.toInt, start.toInt + n.toInt).mkString(" "))
      assert(n === math.min(c.toLong, toks.length - start))
    }
    // chunks tile the doc at the stride; union of chunks covers all tokens
    got.groupBy(_._1).foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong))
      sorted.foreach { case (_, k, start, _, _) => assert(start === k * s) }
      val lastEnd = sorted.last._3 + sorted.last._4
      assert(lastEnd === docs(id).length.toLong, s"doc $id not fully covered")
      // no degenerate tail: every chunk past the first starts before the
      // previous chunk's end AND contributes at least one new token
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 < a._3 + a._4 && b._3 + b._4 > a._3 + a._4)
        case _ => ()
      }
    }
    // pure per-row fan-out: no exchange except the final oracle-parity sort
    // (sparkPlan, not executedPlan: AQE's re-print drops the partitioning
    // detail that distinguishes the sort's range exchange from a shuffle)
    val plan = df.queryExecution.sparkPlan.toString
    val exchanges = "Exchange \\w+".r.findAllIn(plan).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"chunking must not shuffle (only the final sort may):\n$plan")
    assert(plan.contains("Generate"), "expected an explode-based fan-out")
  }

  test("chunk arithmetic is exact at every boundary length (t15)") {
    val c = Sampling.ChunkTokens.toInt
    val s = Sampling.ChunkStride.toInt
    // every off-by-one habitat: 1 token, stride±1, width±1, width+stride±1,
    // exact multiples, and a long doc
    val lengths = Seq(1, s - 1, s, s + 1, c - 1, c, c + 1, c + s - 1, c + s,
      c + s + 1, 2 * c, 3 * s, 10 * c + 7)
    import spark.implicits._
    val docs = lengths.zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(k => s"w$k").mkString(" ")) }
      .toDF("doc_id", "text")
    val got = Sampling.chunkTokens(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("n_tok"),
        r.getAs[String]("chunk_text")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    lengths.zipWithIndex.foreach { case (n, i) =>
      val toks = (1 to n).map(k => s"w$k")
      // reference: starts 0,s,2s,… covering the doc, none past n-c except
      // the mandatory cover-completion, always ≥1 chunk
      val starts = (0 to (math.max(n - c, 0) + s - 1) / s).map(_ * s)
      val chunks = got(i.toLong)
      assert(chunks.length === starts.length, s"len=$n: ${chunks.length} chunks")
      chunks.zip(starts).foreach { case ((_, k, start, nt, text), st) =>
        assert(start === st.toLong, s"len=$n chunk=$k")
        assert(nt === math.min(c, n - st).toLong, s"len=$n chunk=$k n_tok")
        assert(text === toks.slice(st, st + c).mkString(" "), s"len=$n chunk=$k text")
      }
      // full coverage, no redundant tail
      assert(chunks.last._3 + chunks.last._4 === n.toLong)
      if (chunks.length > 1)
        assert(chunks.last._3 < chunks.init.last._3 + chunks.init.last._4)
    }
  }

  test("two-level token sharding equals the flat running sum (t8)") {
    val docs = graft.core.Tables(spark, Sf).documents
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ", -1).length.toLong)
      .sortBy(_._1)
    var cum = 0L
    val expected = docs.map { case (id, n) =>
      val shard = cum / 5000L; cum += n; (id, n, shard)
    }
    val got = Sampling.tokenShards(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("shard_id")))
    assert(got.toSeq === expected.toSeq)
    // shards are contiguous in doc_id order and monotone
    assert(got.map(_._3).toSeq === got.map(_._3).sorted.toSeq)
  }

  test("sequence packing tiles the token stream exactly (t20)") {
    val S = Sampling.SeqTokens
    val seqs = Sampling.packSequences(spark, Sf).collect()
      .map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"),
        r.getAs[Long]("n_tok")))
    val total = graft.core.Tables(spark, Sf).documents
      .select(sum(size(split(col("text"), " ")).cast("long"))).first().getLong(0)
    // seq ids are 0..N-1 dense; every sequence is exactly S tokens except
    // a possibly-short final one; token counts tile the whole stream
    assert(seqs.map(_._1).toSeq === (0L until seqs.length.toLong))
    assert(seqs.init.forall(_._5 == S))
    assert(seqs.map(_._5).sum === total)
    // doc spans are contiguous: a sequence starts with the previous
    // sequence's last doc (the cut fell inside it) or the next doc (the
    // cut fell exactly on its boundary) — never skips or reorders
    seqs.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._4 || b._3 == a._4 + 1)
      case _ => ()
    }
    // fixture doc_ids are dense, so a span's doc count is its id range
    assert(seqs.forall(s => s._2 == s._4 - s._3 + 1))
  }

  test("source cap keeps at most K per source, deterministically (t21)") {
    val got = Sampling.sourceCap(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val perSource = got.groupBy(_._2).view.mapValues(_.length)
    assert(perSource.values.forall(_ <= Sampling.CapPerSource))
    assert(perSource.values.exists(_ == Sampling.CapPerSource),
      "no source reached the cap — fixture too small to exercise it")
    // determinism at any parallelism: same draw on a re-run
    val again = Sampling.sourceCap(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    assert(got.toSeq === again.toSeq)
  }
}
