package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Tripwire for the driver-materialization audit (SCALING.md
  * "driver-materialization audit" table) — the broadcast audit's sibling:
  * a `.collect()`/`.first()` in a product path is legal iff the
  * materialized frame is bounded by CONTRACT (config-, query-, or
  * request-sized) or is per-run METADATA (groups, shards, partition
  * keys) — never corpus-sized. Counts per file are pinned so a new
  * driver materialization cannot land without a recorded boundedness
  * rationale (the r14 q5 lesson: prose-scoped sweeps miss sites;
  * enumerations with a count pin do not).
  */
class DriverCollectAuditSpec extends AnyFunSuite {

  private val SrcRoot = "src/main/scala"

  private val Patterns =
    Seq(".collect()", ".first()", ".toLocalIterator", "collectAsList")

  /** SCALING.md's counting rule: pattern occurrences outside pure comment
    * lines (line comments, scaladoc continuation stars, block-comment
    * openers).
    */
  private def countSites(p: Path): Int =
    Files.readAllLines(p).asScala.map { line =>
      val s = line.trim
      if (s.startsWith("//") || s.startsWith("*") || s.startsWith("/*")) 0
      else Patterns.map(pat => line.sliding(pat.length).count(_ == pat)).sum
    }.sum

  // The audited state: per-file counts at the last audit (SCALING.md r15
  // table). A mismatch means a site was added, removed, or moved WITHOUT
  // updating the audit table.
  private val Audited = Map(
    "graft/ScaleStress.scala" -> 1,
    "graft/StreamScaleStress.scala" -> 2,
    "graft/pipeline/CleanJob.scala" -> 1,
    "graft/pipeline/ExportJob.scala" -> 2,
    "graft/queries/Dedup.scala" -> 2,
    "graft/queries/Events.scala" -> 1,
    "graft/queries/Layout.scala" -> 1,
    "graft/queries/Sampling.scala" -> 2,
    "graft/queries/Similarity.scala" -> 4,
    "graft/queries/Sketches.scala" -> 5,
    "graft/queries/TextAnalysis.scala" -> 1)

  test("every collect/first site is enumerated in SCALING.md's driver-materialization audit") {
    val root = Paths.get(SrcRoot)
    assert(Files.isDirectory(root),
      s"expected to run from the repo root; $SrcRoot not found under ${sys.props("user.dir")}")
    val found = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map(p => root.relativize(p).toString -> countSites(p))
      .filter(_._2 > 0)
      .toMap
    val drift = (found.keySet ++ Audited.keySet).toSeq.sorted.flatMap { f =>
      (found.getOrElse(f, 0), Audited.getOrElse(f, 0)) match {
        case (a, b) if a == b => None
        case (a, b) => Some(s"$f: $a site(s) in source vs $b audited")
      }
    }
    assert(drift.isEmpty,
      "driver-materialization sites drifted from the SCALING.md audit:\n  " +
        drift.mkString("\n  ") +
        "\nFor each new site: add a row to SCALING.md's " +
        "driver-materialization audit table stating what is collected " +
        "and why its size is bounded by contract or metadata (never by " +
        "the corpus), then update Audited here. For removed/moved " +
        "sites: update both the same way.")
  }
}
