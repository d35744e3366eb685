package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declared-constraint validation over any frame — the ingest GATE of a
  * training-data pipeline (the Deequ/Great-Expectations class of tooling).
  * Every [[RowCheck]]/[[UniqueCheck]] folds into ONE scan of the child
  * frame; each [[FkCheck]] additionally costs one pass over the child
  * plus one over its parent's distinct keys (see the FK section below) —
  * size a pipeline by scans-of-child + 2·|FK edges|, not "one scan". The
  * report — one row per constraint with its satisfaction rate and
  * pass/fail against a declared threshold — is what a pipeline run blocks
  * on before promoting a zone.
  *
  * Check kinds:
  *  - [[RowCheck]]: a per-row SQL predicate; rate = satisfied / total
  *    rows. SQL boolean semantics apply: an UNKNOWN predicate is a
  *    violation (a null doc_id fails `doc_id IS NOT NULL`, a null lang
  *    fails `lang IN (...)`) — the conservative reading a gate wants.
  *  - [[UniqueCheck]]: column uniqueness; each extra copy of a duplicated
  *    value is one violation (satisfied = total − (non-null − distinct)).
  *    Null rows are NOT uniqueness violations — nullability is a
  *    [[RowCheck]]'s business, and conflating the two double-counts.
  *
  * Scale shape: row/unique checks fold into ONE aggregate over ONE scan —
  * row predicates are codegen'd sums, and only [[UniqueCheck]]s add Expand
  * legs (the exact-distinct price pr1 documents, with the same
  * approx_count_distinct dial at the 100 TB end). [[FkCheck]]s cannot ride
  * that scan: each edge is its own child-pass against the parent's
  * DISTINCT keys (left join + conditional count — see [[report]]). The
  * report is |checks| rows of metadata.
  */
object DataChecks {

  sealed trait Check {
    def name: String
    def threshold: Double
  }

  /** Per-row predicate (Spark SQL boolean expression over the frame's
    * columns); passes when satisfied/total ≥ threshold.
    */
  final case class RowCheck(name: String, predicateSql: String,
      threshold: Double = 1.0) extends Check

  /** Column-uniqueness constraint; passes when
    * (total − duplicateExcess)/total ≥ threshold.
    */
  final case class UniqueCheck(name: String, column: String,
      threshold: Double = 1.0) extends Check

  /** Referential-integrity constraint: a child row is an ORPHAN when its
    * non-null `childCol` value appears nowhere in `parent`'s `parentCol`.
    * SQL FK semantics (MATCH SIMPLE): a NULL child key is NOT an orphan —
    * nullability is a [[RowCheck]]'s business, and conflating the two
    * double-counts. Passes when (total − orphans)/total ≥ threshold.
    */
  final case class FkCheck(name: String, childCol: String,
      parent: DataFrame, parentCol: String,
      threshold: Double = 1.0) extends Check

  private val NamePattern = "^[A-Za-z0-9_]+$".r

  /** The validation report: one row per check —
    * (check_name, satisfied, total, rate, passed), ordered by check_name.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names")
    checks.foreach { c =>
      require(NamePattern.findFirstIn(c.name).isDefined,
        s"check name '${c.name}' must match ${NamePattern.regex} " +
          "(names are embedded in generated SQL)")
      require(c.threshold >= 0.0 && c.threshold <= 1.0,
        s"check '${c.name}': threshold ${c.threshold} outside [0, 1]")
    }
    // the verdict is EXACT integer arithmetic, never the rounded display
    // rate: `round(rate, 6) >= thr` silently passed up to 5e-7 of
    // violations through HALF_UP (one orphan in 2M rows rounds to
    // 1.000000 and beat a strict 1.0 gate), so passed compares
    // satisfied·10^6 against round(thr·10^6)·total in BIGINTs — exact for
    // any frame below ~9e12 rows, identical in the oracle. An EMPTY frame
    // fails every check (total > 0 is part of the verdict): a gate with
    // nothing to verify must not promote, and without the guard the
    // integer compare would vacuously pass (0 ≥ 0); the display rate is
    // NULL there (nullif keeps the division from ANSI-aborting)
    def reportRow(name: String, sat: String, total: String, thr: Double) = {
      val thrScaled = math.round(thr * 1000000L)
      s"""'$name', CAST($sat AS BIGINT), $total,
         |  round(CAST($sat AS DOUBLE) / nullif($total, 0), 6),
         |  $total > 0 AND CAST($sat AS BIGINT) * 1000000L >= ${thrScaled}L * $total"""
        .stripMargin
    }
    val scanChecks = checks.filter(!_.isInstanceOf[FkCheck])
    val scanLeg: Option[DataFrame] =
      if (scanChecks.isEmpty) None
      else {
        val aggs: Seq[Column] = scanChecks.flatMap {
          case RowCheck(n, p, _) =>
            Seq(sum(when(expr(p), 1L).otherwise(0L)).as(s"ok_$n"))
          case UniqueCheck(n, c, _) =>
            Seq(countDistinct(col(c)).as(s"nd_$n"), count(col(c)).as(s"nn_$n"))
          case _: FkCheck => Nil
        } :+ count(lit(1)).as("n_total")
        val agg = df.agg(aggs.head, aggs.tail: _*)
        val rows = scanChecks.map { c =>
          val sat = c match {
            case RowCheck(n, _, _)    => s"ok_$n"
            case UniqueCheck(n, _, _) => s"(n_total - (nn_$n - nd_$n))"
            case f: FkCheck           => sys.error(s"unreachable: ${f.name}")
          }
          reportRow(c.name, sat, "n_total", c.threshold)
        }
        Some(agg.select(expr(
          s"""stack(${scanChecks.size},
             |${rows.mkString(",\n")}
             |) AS (check_name, satisfied, total, rate, passed)"""
            .stripMargin)))
      }
    // each FK leg is one pass over the child joined to the DISTINCT
    // parent keys (left join + conditional count — never a row-multiplying
    // join); the parent side is key-distinct, so AQE broadcasts a dim
    // parent and shuffles a fact-sized one on the key, the standard shape
    val fkLegs = checks.collect { case f: FkCheck =>
      val parentKeys = f.parent
        .select(col(f.parentCol).as("graft_fk_key")).distinct()
        .withColumn("graft_fk_hit", lit(1))
      df.select(col(f.childCol).as("graft_fk_key"))
        .join(parentKeys, Seq("graft_fk_key"), "left")
        .agg(
          count(lit(1)).as("n_total"),
          sum(when(col("graft_fk_key").isNotNull &&
            col("graft_fk_hit").isNull, 1L).otherwise(0L)).as("orphans"))
        .select(expr(
          s"""stack(1,
             |${reportRow(f.name, "(n_total - orphans)", "n_total", f.threshold)}
             |) AS (check_name, satisfied, total, rate, passed)"""
            .stripMargin))
    }
    (scanLeg.toSeq ++ fkLegs).reduce(_ unionAll _).orderBy("check_name")
  }
}
