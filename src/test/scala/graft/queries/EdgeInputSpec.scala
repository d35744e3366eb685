package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Edge inputs the clean sf fixtures never exercise — null text, empty
  * eval slices, zero-norm embeddings. The oracle gate runs on a benign
  * corpus, so these divergence classes (Spark-vs-DuckDB AND
  * correct-vs-garbage) only show up here.
  */
class EdgeInputSpec extends SparkTestBase {
  import spark.implicits._

  /** A scratch corpus dir holding the given documents rows. */
  private def docsDir(name: String,
      rows: Seq[(Long, Option[String], String, String)]): String = {
    val dir = scratch(name)
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(coalesce(col("text"), lit(""))).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d5: null-text docs produce no grams and never pair with each other") {
    // the gram builder used to collapse null tokens via concat_ws to one
    // shared xxhash64("") gram, pairing every null-text (and empty-text)
    // doc at jaccard 1.0 — while the DuckDB twin's NULL gram never joins
    val dir = docsDir("edge-d5", Seq(
      (1L, None, "en", "web"),
      (2L, None, "en", "web"),
      (3L, Some("the quick brown fox jumps over the lazy dog"), "en", "web"),
      (4L, Some("the quick brown fox jumps over the lazy cat"), "en", "web")))
    val pairs = Dedup.ngramJaccard(spark, dir).collect()
    assert(!pairs.exists(r => r.getLong(0) <= 2 || r.getLong(1) <= 2),
      s"null-text doc appeared in a pair: ${pairs.mkString(", ")}")
    assert(pairs.exists(r => r.getLong(0) == 3L && r.getLong(1) == 4L),
      "real near-dup pair lost")
  }

  test("d15: an empty eval slice returns zero rows like d8, instead of crashing the bloom") {
    // no doc_id ≡ 0 (mod EvalMod) clears the gram threshold here, so the
    // eval gram set is empty: BloomFilter.create(0) used to throw
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = docsDir("edge-d15",
      (1L to 12L).map(i => (i, Some(text + s" tail$i"), "en", "web")))
    assert(Dedup.bloomDecontaminate(spark, dir).count() === 0L)
    assert(Dedup.decontaminate(spark, dir).count() === 0L, "d8 twin disagrees")
  }

  test("e4: non-integral and beyond-Long props degrade to null on both engines, never abort") {
    // ANSI Spark: a bare cast aborts on "90.5" (CAST_INVALID_INPUT) and on
    // integral strings past Long range (CAST_OVERFLOW) — the regex guard
    // plus try_cast pins "non-integral or unrepresentable => null" so one
    // poison prop cannot crash the job; the DuckDB twin's regexp_matches +
    // TRY_CAST nulls the identical set
    val dir = scratch("edge-e4")
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq(
      (1L, ts, 1L, "view", 1.0, """{"k": "95"}"""),      // integral, kept
      (2L, ts, 1L, "view", 1.0, """{"k": "90.5"}"""),    // non-integral -> null
      (3L, ts, 1L, "view", 1.0, """{"k": "99999999999999999999"}"""), // beyond Long -> null
      (4L, ts, 1L, "view", 1.0, """{"k": "89"}"""),      // integral, below filter
      (5L, ts, 1L, "view", 1.0, """{"j": 1}"""),         // key absent -> null
      (6L, ts, 1L, "view", 1.0, null))                   // null props -> null
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.propsExtract(spark, dir).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 95L)),
      s"expected only event 1 to survive, got ${got.mkString(", ")}")
  }

  test("d11: a zero-norm vector neither flags others nor gets flagged on a NaN witness") {
    val dir = scratch("edge-d11")
    def vec(seed: Int): Seq[Float] =
      (0 until 8).map(j => ((seed * 31 + j * 7) % 10 + 1).toFloat / 10f)
    val rows =
      (0L until 8L).map(i => (i, vec(i.toInt), 0)) ++
        // two genuine near-identical vectors (a real semantic dup pair)
        Seq((20L, vec(3), 1), (21L, vec(3).updated(0, vec(3)(0) + 0.001f), 1),
          // the broken encoder output: all zeros — its cosine against
          // anything is 0/0 = NaN, which both engines call >= threshold
          (30L, Seq.fill(8)(0f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val dups = Dedup.semanticDedup(spark, dir, numCells = 2).collect()
    assert(!dups.exists(r => r.getLong(0) == 30L),
      "zero-norm vector was flagged as a semantic dup")
    assert(dups.forall(r => !r.getDouble(2).isNaN),
      s"NaN witness survived: ${dups.mkString(", ")}")
    assert(dups.exists(r => r.getLong(0) == 21L),
      "the real near-identical pair must still flag (20 survives, 21 dups)")
  }
}
