package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Skew

/** Sketch-based aggregation surface (SURVEY §7.1 step 8's
  * `approx_count_distinct`-class): HLL cardinalities next to their exact
  * counts. The two engines run DIFFERENT sketch implementations, so the
  * oracle-comparable output is the exact count plus a within-tolerance
  * boolean — each engine's estimate must land within 10% of truth (HLL at
  * these cardinalities is well inside that; the check is deterministic for
  * a fixed dataset, not flaky).
  */
object Sketches {

  private val Tolerance = 0.10

  def sketchDistinct(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def one(name: String, df: DataFrame, c: String): DataFrame =
      df.agg(
        countDistinct(col(c)).as("exact_n"),
        approx_count_distinct(col(c)).as("approx_n"))
        .select(
          lit(name).as("key"),
          col("exact_n"),
          (abs(col("approx_n") - col("exact_n")).cast("double") / col("exact_n")
            <= Tolerance).as("approx_ok"))
    one("l_partkey", t.lineitem, "l_partkey")
      .unionAll(one("o_custkey", t.orders, "o_custkey"))
      .unionAll(one("user_id", t.events, "user_id"))
      .orderBy("key")
  }

  val sketchDistinctSql: String =
    s"""SELECT 'l_partkey' AS key, count(DISTINCT l_partkey) AS exact_n,
       |  abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey)) * 1.0
       |    / count(DISTINCT l_partkey) <= $Tolerance AS approx_ok
       |FROM lineitem
       |UNION ALL
       |SELECT 'o_custkey', count(DISTINCT o_custkey),
       |  abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey)) * 1.0
       |    / count(DISTINCT o_custkey) <= $Tolerance
       |FROM orders
       |UNION ALL
       |SELECT 'user_id', count(DISTINCT user_id),
       |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id)) * 1.0
       |    / count(DISTINCT user_id) <= $Tolerance
       |FROM events
       |ORDER BY key""".stripMargin

  /** Two-phase salted aggregation over the MOST skewed grouping in the
    * schema (3 return flags across the whole lineitem table): must equal
    * the plain GROUP BY — the oracle is the unsalted formulation, so the
    * salting is proven result-invariant, not just plausible.
    */
  def saltedRollup(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedSum(
      Tables(spark, dir).lineitem.select("l_returnflag", "l_quantity"),
      keys = Seq("l_returnflag"), value = "l_quantity",
      saltBuckets = 32, resultName = "sum_qty")
      .select(col("l_returnflag"), round(col("sum_qty"), 2).as("sum_qty"))
      .orderBy("l_returnflag")

  val saltedRollupSql: String =
    """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Exact interpolated percentiles per group (the distribution-shape
    * counterpart of z1's cardinalities), computed rank-based: row_number +
    * count over a per-group sort, keep ONLY the two order statistics each
    * percentile interpolates between, interpolate in a tiny final select.
    * This beats the builtin `percentile` aggregate (a TypedImperativeAgg
    * merging a per-partition value→count map — measured 4.5 s vs 1.x s at
    * sf0.1) because the heavy path stays in Tungsten sort + codegen and the
    * collected state is 6 rows per group, not every distinct value.
    * At 100 TB swap in `approx_percentile` (mergeable sketch, bounded
    * memory, no global per-group sort) — same query shape.
    */
  def priceQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    val ranked = Tables(spark, dir).lineitem
      .select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w) - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("l_returnflag")))
    // a row survives iff it is the floor- or ceil-rank of SOME percentile
    val needed = ps.map { case (_, p) =>
      val pos = (col("n") - 1) * p
      (col("rn") === floor(pos)) || (col("rn") === ceil(pos))
    }.reduce(_ || _)
    val picked = ranked.filter(needed)
    val aggs = ps.map { case (name, p) =>
      val rowPos = (col("n") - 1) * p // row-level, inside aggregate args
      val pos = (max(col("n")) - 1) * p // aggregate-level, for the fraction
      val lo = max(when(col("rn") === floor(rowPos), col("l_extendedprice")))
      val hi = max(when(col("rn") === ceil(rowPos), col("l_extendedprice")))
      round(lo + (pos - floor(pos)) * (hi - lo), 4).as(name)
    }
    picked.groupBy("l_returnflag")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("l_returnflag")
  }

  val priceQuantilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Misra–Gries counter budget per partition; the heavy-hitter threshold
    * is relative — freq ≥ total/HhK (0.5% of the token stream) — so the
    * candidate guarantee holds at every corpus size with the same k.
    */
  val HhK = 200

  /** EXACT heavy hitters over the corpus token stream, two passes:
    * (1) a per-partition Misra–Gries sketch (k = [[HhK]] counters) emits
    * candidate tokens plus the partition's token count; (2) an exact
    * recount of ONLY the candidates, kept iff cnt·k ≥ total. MG can
    * undercount but never evicts a token with partition-frequency ≥ n_p/k,
    * and freq ≥ total/k globally implies ≥ n_p/k in some partition
    * (pigeonhole) — so candidates ⊇ true heavy hitters and the exact
    * recount makes the output EXACT: independent of partitioning, task
    * order, and k (k only prices the prune). That is what makes a plain
    * `GROUP BY token HAVING cnt·k ≥ total` the oracle.
    *
    * Scale shape (Misra/Gries 1982; the streaming classic): pass 1 shuffles
    * NOTHING and collects ≤ (k+1)·partitions tiny rows — candidate tokens
    * and per-partition totals are driver-side metadata, same class as the
    * export manifest — while pass 2 shuffles only candidate-token rows
    * (≤ k·partitions distinct keys), not the full Zipf vocabulary. At a
    * trillion-token corpus the naive groupBy ships every distinct token
    * through the exchange; this ships ~10⁴. At extreme partition counts
    * the candidate union itself tree-aggregates first (a `distinct()`
    * before the collect) — the collect stays bounded by the true union.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    heavyHittersOf(Tables(spark, dir).documents, HhK)

  /** [[heavyHitters]] over any (text) frame with an explicit counter
    * budget — the spec drives it at several parallelisms and k's and
    * asserts the output never moves.
    */
  def heavyHittersOf(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    // pass 1: per-partition MG candidates + partition token counts.
    // Emitted as (token|null, n) rows: null carries the count — retry-safe
    // (a re-run task re-emits the same rows), unlike an accumulator.
    val partial = toks.as[String].mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      it.foreach { t =>
        n += 1
        counts.get(t) match {
          case Some(c) => counts.update(t, c + 1)
          case None if counts.size < k => counts.update(t, 1L)
          case None => // decrement-all, drop zeros: the MG eviction step
            counts.keys.toArray.foreach { k =>
              val c = counts(k) - 1
              if (c == 0) counts.remove(k) else counts.update(k, c)
            }
        }
      }
      Iterator.single((null: String, n)) ++ counts.keysIterator.map((_, 0L))
    }.toDF("token", "n").collect() // ≤ (k+1)·partitions rows — metadata
    val total = partial.filter(_.isNullAt(0)).map(_.getLong(1)).sum
    val cands = partial.filter(!_.isNullAt(0)).map(_.getString(0)).distinct.toSeq
    // pass 2: exact recount of candidates only
    toks.join(broadcast(cands.toDF("token")), "token")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k >= total)
      .orderBy(desc("cnt"), asc("token"))
  }

  /** The SQL twin at an arbitrary budget — the scale study grows k with
    * the corpus (threshold total/k stays a fixed per-replica share), so
    * the oracle must too.
    */
  def heavyHittersSqlFor(k: Int): String =
    s"""WITH raw AS (
       |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       |toks AS (SELECT token FROM raw WHERE len(token) > 0),
       |tot AS (SELECT count(*) AS n FROM toks)
       |SELECT token, count(*) AS cnt
       |FROM toks, tot
       |GROUP BY token, tot.n
       |HAVING count(*) * $k >= tot.n
       |ORDER BY cnt DESC, token""".stripMargin

  val heavyHittersSql: String = heavyHittersSqlFor(HhK)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "z1_sketch_distinct" -> (sketchDistinct _),
    "z2_salted_rollup" -> (saltedRollup _),
    "z3_price_quantiles" -> (priceQuantiles _),
    "z4_heavy_hitters" -> (heavyHitters _))

  val oracles: Map[String, String] = Map(
    "z1_sketch_distinct" -> sketchDistinctSql,
    "z2_salted_rollup" -> saltedRollupSql,
    "z3_price_quantiles" -> priceQuantilesSql,
    "z4_heavy_hitters" -> heavyHittersSql)
}
