package graft.queries

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

/** Contracts for n17's vector UPDATE on the persisted IVF+PQ index
  * ([[Similarity.upsertIvfPqIndex]]): an upserted index must be
  * indistinguishable from a frozen-quantizer rebuild over the POST-update
  * corpus — which means a moved id leaves NO stale row in its old cell, a
  * cell emptied by the moves loses its partition directory, a
  * guard-rejected update deletes, a re-landed batch is content-idempotent
  * — and the `ledger/` artifact that makes the old-cell lookup batch-
  * bounded stays equal to the codes projection through build, append and
  * upsert (self-healing when absent).
  */
class IvfPqUpsertSpec extends SparkTestBase {

  private lazy val SfDir = testData("0.001")

  private def norm(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  /** Full codes content, engine-canonical (cell partition values read
    * back as long), order-insensitive.
    */
  private def codesRows(idx: String): Seq[Seq[Any]] = {
    val cols = col("vec_id") +: col("cell").cast("long").as("cell") +:
      (0 until Similarity.PqM).map(m => col(s"c$m"))
    spark.read.parquet(s"$idx/codes").select(cols: _*)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
  }

  /** The ledger as an id→cell map, asserting its per-id uniqueness (a
    * duplicate row means a maintenance write skipped the anti-join).
    */
  private def ledgerMap(idx: String): Map[Long, Long] = {
    val rows = spark.read.parquet(s"$idx/ledger")
      .select(col("vec_id"), col("cell").cast("long")).collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "ledger must hold exactly one row per vec_id")
    rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def codesProjection(idx: String): Map[Long, Long] =
    spark.read.parquet(s"$idx/codes")
      .select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("upsert-then-probe equals frozen-quantizer rebuild over the post-update corpus") {
    val idxU = scratch("ivfpq_upsert_eq_u")
    val idxR = scratch("ivfpq_upsert_eq_r")
    Similarity.buildIvfPqIndex(spark, SfDir, idxU)
    val touched = Similarity.upsertIvfPqIndex(spark, idxU,
      Similarity.upsertBatch(spark, SfDir))
    assert(touched.nonEmpty, "the fixture batch must touch some cell")
    // frozen rebuild over the POST-update corpus: a fresh full-corpus
    // base gives the artifact its (frozen) quantizers + ledger, then
    // codes/ is DROPPED before the recode append so the baseline is a
    // pure fresh coding of (originals minus the split) ∪ (negated
    // split). Appending onto the populated base instead would be
    // fixture-fragile: append cannot truncate a cell wholly emptied by
    // the update (its touched set is the batch's destination cells), so
    // a cell whose entire membership fell in the split would keep stale
    // rows in the BASELINE while the upsert correctly removes them
    // (r20 review finding).
    Similarity.buildIvfPqIndex(spark, SfDir, idxR)
    graft.core.FsUtil.deleteRecursively(s"$idxR/codes")
    Similarity.appendToIvfPqIndex(spark, idxR,
      Similarity.postUpsertCorpus(spark, SfDir))
    val u = norm(Similarity.probeIvfPqIndex(spark, SfDir, idxU, nprobe = 2))
    val r = norm(Similarity.probeIvfPqIndex(spark, SfDir, idxR, nprobe = 2))
    assert(u.nonEmpty && u == r,
      "an upserted index must serve exactly what a frozen rebuild over the post-update corpus serves")
    assert(codesRows(idxU) == codesRows(idxR),
      "the artifacts themselves must hold identical code rows")
    assert(ledgerMap(idxU) == ledgerMap(idxR),
      "the ledgers must hold identical id→cell maps")
  }

  test("a moved id leaves no stale row; old partitions rewritten; ledger follows") {
    val idx = scratch("ivfpq_upsert_move")
    Similarity.buildIvfPqIndex(spark, SfDir, idx)
    val before = ledgerMap(idx)
    val countBefore = spark.read.parquet(s"$idx/codes").count()
    val batch = Similarity.upsertBatch(spark, SfDir)
    val batchIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(batchIds.nonEmpty)
    val fpBefore = before.values.toSeq.distinct.sorted
      .map(c => c -> fsFingerprint(s"$idx/codes/cell=$c")).toMap
    Similarity.upsertIvfPqIndex(spark, idx, batch)
    val after = ledgerMap(idx)
    val moved = batchIds.filter(id =>
      before.get(id).exists(c => after.get(id).exists(_ != c)))
    assert(moved.nonEmpty,
      "the negated batch must move at least one id across cells")
    assert(spark.read.parquet(s"$idx/codes").count() == countBefore,
      "pure updates must preserve cardinality")
    // every batch id sits EXACTLY once in codes, in its post-upsert cell
    val placed = spark.read.parquet(s"$idx/codes")
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .filter(col("vec_id").isin(batchIds.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(placed.length == batchIds.size &&
      placed.map(_._1).distinct.length == placed.length,
      "a moved id must appear exactly once — no stale duplicate in its old cell")
    placed.foreach { case (id, c) =>
      assert(after(id) == c, s"ledger must track $id to its new cell") }
    // a moved id's OLD partition was actually rewritten (byte-level:
    // fingerprint changed, or the whole dir emptied away)
    moved.map(before).toSeq.distinct.foreach { c =>
      val dir = new File(s"$idx/codes/cell=$c")
      val fpNow = if (dir.exists()) fsFingerprint(dir.getPath) else Nil
      assert(fpNow != fpBefore(c),
        s"moved ids' old partition cell=$c must be rewritten or removed")
    }
  }

  test("a cell emptied by the upsert loses its partition directory") {
    val idx = scratch("ivfpq_upsert_empty")
    Similarity.buildIvfPqIndex(spark, SfDir, idx)
    val ledger = ledgerMap(idx)
    val cellDirs = new File(s"$idx/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(_.getName.stripPrefix("cell=").toLong)
    val c0 = cellDirs.min
    val victims = spark.read.parquet(s"$idx/codes/cell=$c0").select("vec_id")
    val vIds = victims.collect().map(_.getLong(0)).toSet
    assert(vIds.nonEmpty)
    // one DONOR embedding for every victim: a vector living in another
    // cell re-codes to that same cell under the frozen quantizer (that is
    // why it lives there), so the whole victim set deterministically
    // vacates c0 and lands in donorCell
    val donorId = ledger.collectFirst { case (id, c) if c != c0 => id }.get
    val donorCell = ledger(donorId)
    val batch = victims.crossJoin(
      Tables(spark, SfDir).embeddings
        .filter(col("vec_id") === donorId).select("embedding"))
    val touched = Similarity.upsertIvfPqIndex(spark, idx, batch)
    assert(touched.contains(c0) && touched.contains(donorCell))
    assert(!new File(s"$idx/codes/cell=$c0").exists(),
      "an emptied partition must be deleted, not left as a stale directory")
    val after = ledgerMap(idx)
    vIds.foreach(id => assert(after(id) == donorCell))
    val rows = spark.read.parquet(s"$idx/codes")
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .filter(col("vec_id").isin(vIds.toSeq: _*)).collect()
    assert(rows.length == vIds.size && rows.forall(_.getLong(1) == donorCell),
      "every victim must sit exactly once, in the donor's cell")
  }

  test("a guard-rejected update DELETES the stale row from codes and ledger") {
    val idx = scratch("ivfpq_upsert_guard")
    Similarity.buildIvfPqIndex(spark, SfDir, idx)
    val ledger = ledgerMap(idx)
    val victim = ledger.keys.max
    val oldCell = ledger(victim)
    import spark.implicits._
    // a zero vector carries no direction: the frozen rebuild over the
    // post-update corpus drops it (pqCorpus guard), so the upsert must too
    val batch = Seq((victim,
      Seq.fill(graft.functions.VectorLsh.Dim)(0.0f))).toDF("vec_id", "embedding")
    val touched = Similarity.upsertIvfPqIndex(spark, idx, batch)
    assert(touched == Seq(oldCell),
      "the delete's only touched cell is the victim's old one")
    assert(spark.read.parquet(s"$idx/codes")
      .filter(col("vec_id") === victim).count() == 0,
      "the stale row must be gone from codes")
    assert(!ledgerMap(idx).contains(victim),
      "the stale mapping must be gone from the ledger")
    // scope note: this pins the common case (the victim's bucket holds
    // other ids, so dynamic overwrite rewrites it). A delete batch
    // covering a bucket's ENTIRE id population would keep that bucket's
    // rows on disk — the documented, deliberate ledger/codes truncation
    // asymmetry (see mergeLedger's scaladoc): a stale ledger row cannot
    // change an answer, only widen a later touched set.
  }

  test("re-landing the same upsert batch is content-idempotent") {
    val idx = scratch("ivfpq_upsert_idem")
    Similarity.buildIvfPqIndex(spark, SfDir, idx)
    val batch = Similarity.upsertBatch(spark, SfDir)
    val t1 = Similarity.upsertIvfPqIndex(spark, idx, batch)
    val once = codesRows(idx)
    val onceLedger = ledgerMap(idx)
    val probeOnce = norm(Similarity.probeIvfPqIndex(spark, SfDir, idx, nprobe = 2))
    val t2 = Similarity.upsertIvfPqIndex(spark, idx, batch)
    assert(t2.toSet.subsetOf(t1.toSet),
      "a re-landed upsert touches at most the first landing's cells " +
        "(the ledger already points the ids at their new homes)")
    assert(codesRows(idx) == once && ledgerMap(idx) == onceLedger,
      "a re-landed batch must not change the artifact's content")
    assert(norm(Similarity.probeIvfPqIndex(spark, SfDir, idx, nprobe = 2)) == probeOnce)
  }

  test("build and append keep ledger == codes projection; a deleted ledger self-heals") {
    val idx = scratch("ivfpq_upsert_ledger")
    Similarity.buildIvfPqBaseIndex(spark, SfDir, idx)
    assert(new File(s"$idx/ledger").listFiles()
      .exists(_.getName.startsWith("b=")),
      "the ledger must be written hash-bucket-partitioned")
    assert(ledgerMap(idx) == codesProjection(idx),
      "build must write ledger == codes projection")
    Similarity.appendToIvfPqIndex(spark, idx,
      Similarity.appendDelta(spark, SfDir))
    assert(ledgerMap(idx) == codesProjection(idx),
      "append must keep ledger == codes projection")
    // self-heal (the documented crash repair): ledger removed, the next
    // upsert re-derives it from codes before its old-cell lookup
    graft.core.FsUtil.deleteRecursively(s"$idx/ledger")
    val touched = Similarity.upsertIvfPqIndex(spark, idx,
      Similarity.upsertBatch(spark, SfDir))
    assert(touched.nonEmpty && ledgerMap(idx) == codesProjection(idx),
      "after the self-heal and the upsert the invariant must hold again")
  }

  test("the registry twin serves the explicitly composed artifact") {
    val idx = scratch("ivfpq_upsert_twin")
    Similarity.buildIvfPqIndex(spark, SfDir, idx)
    Similarity.upsertIvfPqIndex(spark, idx, Similarity.upsertBatch(spark, SfDir))
    val explicit = norm(Similarity.probeIvfPqIndex(spark, SfDir, idx, nprobe = 2))
    assert(norm(Similarity.ivfPqUpsertTopK(spark, SfDir)) == explicit)
  }
}
