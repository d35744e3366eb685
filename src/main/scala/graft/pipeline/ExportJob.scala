package graft.pipeline

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash.hash60
import graft.functions.VectorOps
import graft.queries.Sampling

/** Training-shard EXPORT — the terminal sink of the corpus pipeline: the
  * t8 token-budget shard assignment materialized as one directory per
  * shard of compressed JSONL, the layout a training loader consumes
  * (read shard k = read one directory; a shard's token mass is bounded
  * by construction).
  *
  * Scale contract:
  *  - the shard assignment is the t8 two-level prefix sum (no global
  *    single-partition window);
  *  - `partitionBy(shard_id)` writes every shard directory in one pass —
  *    the single shuffle is the REBALANCE on shard_id that co-locates a
  *    shard's rows (without it, every task holds files for every shard: a
  *    small-files explosion at corpus scale). A rebalance, not a plain
  *    repartition, because AQE's skew splitting applies only to rebalance
  *    partitions — a pathological shard splits across tasks (still one
  *    DIRECTORY via partitionBy) instead of serializing on one task;
  *  - `maxRecordsPerFile` bounds any one file regardless of skew, so a
  *    heavy task splits output files instead of producing a multi-GB one;
  *  - re-export is a FULL overwrite of the zone, deliberately NOT the
  *    clean zone's per-partition dynamic overwrite (K4): K4's partition
  *    values are stable natural keys, but shard_id is a dense prefix-sum
  *    artifact — re-curating the corpus shifts every downstream
  *    assignment and can shrink the shard count, and a per-partition
  *    overwrite would leave the trailing stale shard directories in
  *    place (duplicate training data). Truncate-and-replace is the only
  *    assignment-stable contract; it stays idempotent. A deployment that
  *    needs INCREMENTAL re-export should shard by a stable content key
  *    instead (t7's salted hash mod N — assignments never shift), trading
  *    the strict per-shard token bound for per-partition overwrite.
  */
object ExportJob {

  /** Cap on records per output file — below the fixture's largest shard
    * (95 rows at sf0.001) so the spec actually exercises the file split;
    * production sets it from target file size / mean record size.
    */
  val MaxRecordsPerFile = 50L

  /** Join the shard assignment back to the document payload and write
    * `outDir/shard_id=<k>/part-*.json.gz`. Returns the exported frame
    * (shard_id, doc_id, text, lang, source) for callers that chain.
    */
  def writeTrainingShards(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    val shards = Sampling.tokenShards(spark, dir)
      .select("doc_id", "shard_id", "n_tokens")
    val docs = graft.core.Tables(spark, dir).documents
      .select("doc_id", "text", "lang", "source")
    val export = shards.join(docs, "doc_id")
      .select("shard_id", "doc_id", "text", "lang", "source")
    // static = truncate-and-replace, pinned even under a session-wide
    // dynamic default (stale trailing shard dirs must not survive)
    writeShardPartitions(export, outDir, "static")
    export
  }

  /** Explicit env override of the creation-time shard count, clamped to
    * ≥ 1 (0 would make every pmod-by-shards assignment null/throw). A
    * malformed value fails with a message naming the variable — a bare
    * toInt here would surface as ExceptionInInitializerError on the first
    * unrelated ExportJob touch, far from the cause.
    */
  private val ShardsEnvOverride: Option[Int] =
    sys.env.get("SPARK_GRAFT_EXPORT_SHARDS").map { raw =>
      val v = raw.trim
      require(v.nonEmpty && v.forall(_.isDigit),
        s"SPARK_GRAFT_EXPORT_SHARDS must be a positive integer, got '$raw'")
      math.max(1, v.toInt)
    }

  /** CREATION-TIME shard count in incremental mode; once a zone exists its
    * authoritative count is the persisted [[zoneShards]] marker, and this
    * value only matters for brand-new zones.
    *
    * THIS is the deployment knob that keeps fixed-size zone maintenance
    * O(1): a delete/upsert pays |affected shards| × (zone / shards), so
    * the shard count must scale with the corpus to keep shard size
    * bounded (16 suits the fixture; a 100 TB zone runs thousands, sized
    * to a few hundred MB each). Measured in SCALESTRESS_r11: at x100 the
    * same 4-id delete costs 12.1 s against 16 shards but 3–4× less
    * against 64, tracking shard size exactly. Env-overridable for the
    * scale study (SPARK_GRAFT_EXPORT_SHARDS); fixed per zone lifetime —
    * [[reshard]] is the migration.
    */
  val IncrementalShards: Int = ShardsEnvOverride.getOrElse(16)

  /** Name of the zone's persisted shard-count marker; underscore-prefixed
    * like the manifest so Spark's file listing never sees it as data.
    */
  private val ShardsMarkerName = "_graft_shards"

  /** The persisted shard count of a zone — written at zone creation (or
    * adopted on first use of a pre-marker zone) and authoritative from
    * then on: every maintenance op derives its doc→shard mapping from the
    * marker, never from session configuration, so a session configured
    * with a different count cannot silently remap docs to wrong shards
    * (the data-safety hazard: a delete computed under the wrong modulus
    * rewrites the wrong shards and leaves "deleted" docs in place). An
    * EXPLICITLY conflicting request fails loudly instead — see
    * [[resolveZoneShards]]; [[reshard]] is the one legal way to change it.
    */
  def zoneShards(outDir: String): Option[Int] = {
    val p = Paths.get(outDir, ShardsMarkerName)
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt)
  }

  /** Write a small metadata file atomically (temp + rename): a crash
    * mid-write must never leave a truncated marker/manifest that bricks
    * every later maintenance op with a parse error — the one crash window
    * the staged-swap/self-heal design would otherwise not cover.
    */
  private def writeMetaFile(outDir: String, name: String, body: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val tmp = Paths.get(outDir, s"$name.__tmp__")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(outDir, name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def writeShardsMarker(outDir: String, n: Int): Unit =
    writeMetaFile(outDir, ShardsMarkerName, s"$n\n")

  /** The ONE shard-directory writer all four zone writers share: rebalance
    * by shard (AQE may split a skewed shard across tasks, still one
    * directory via partitionBy), partition column sorted first (the file
    * writer would otherwise insert its own unstable sort, scrambling
    * doc_id order), bounded file sizes, gzip JSONL. A single recipe is
    * load-bearing, not style: the fingerprint diff skips byte-stable
    * shards, so a writer that diverged (different sort, compression, or
    * options) would produce fingerprint-equal but byte-different output
    * and silently break the untouched-mtime contract.
    */
  private def writeShardPartitions(df: DataFrame, outDir: String,
      overwriteMode: String): Unit =
    df.hint("rebalance", col("shard_id"))
      .sortWithinPartitions("shard_id", "doc_id")
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", overwriteMode)
      .option("maxRecordsPerFile", MaxRecordsPerFile)
      .option("compression", "gzip")
      .partitionBy("shard_id")
      .json(outDir)

  /** Drop one shard directory; a no-op if it does not exist. */
  private def dropShardDir(outDir: String, id: Long): Unit = {
    val d = new File(outDir, s"shard_id=$id")
    if (d.isDirectory) { d.listFiles().foreach(_.delete()); d.delete() }
  }

  /** The zone's shard-directory ids, from one file listing — shared by
    * the full-zone read, the adoption check, and the has-layout test.
    */
  private def zoneLayoutIds(outDir: String): Seq[Long] =
    Option(new File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
      .map(_.getName.stripPrefix("shard_id=").toLong).sorted.toSeq

  /** Whether `outDir` materially IS a zone: it holds shard data or a
    * manifest (a manifest-only zone — every shard emptied — still counts).
    */
  private def zoneHasLayout(outDir: String): Boolean =
    zoneLayoutIds(outDir).nonEmpty ||
      Files.exists(Paths.get(outDir, ManifestName))

  /** Resolve the shard count an operation on `outDir` must use, enforcing
    * the fixed-per-zone-lifetime contract: the zone's marker wins; a
    * conflicting EXPLICIT request (API argument or the
    * SPARK_GRAFT_EXPORT_SHARDS override) throws, pointing at [[reshard]].
    * A marker-less zone that already holds data (written before markers
    * existed) verifies the adopted count against the zone itself
    * ([[verifyAdoptedShards]]) and then persists it — otherwise the
    * adoption would just persist the same silent-remap hazard the marker
    * exists to kill. A path with NO layout at all resolves the count but
    * persists NOTHING: a pure-maintenance op against a nonexistent or
    * mistyped path must stay a harmless no-op, not conjure a marker-only
    * directory that pins a possibly-wrong count on a path that may later
    * receive the real zone — writers persist the marker themselves when
    * they first materialize the zone.
    */
  private[pipeline] def resolveZoneShards(spark: SparkSession,
      outDir: String, requested: Option[Int]): Int = {
    val explicit = requested.map(v => math.max(1, v)).orElse(ShardsEnvOverride)
    zoneShards(outDir) match {
      case Some(n) =>
        explicit.filter(_ != n).foreach { m =>
          throw new IllegalStateException(
            s"export zone $outDir was written with $n shards but $m were " +
              "requested: the doc->shard mapping is fixed per zone " +
              "lifetime - run ExportJob.reshard to migrate the zone")
        }
        n
      case None =>
        val n = explicit.getOrElse(IncrementalShards)
        if (zoneHasLayout(outDir)) {
          verifyAdoptedShards(spark, outDir, n)
          writeShardsMarker(outDir, n)
        }
        n
    }
  }

  /** Check an adopted (marker-less legacy zone) shard count against the
    * zone's own layout before persisting it: every shard directory id
    * must be below the count, and every row of up to three PROBE
    * directories — lowest, median, and highest id — must hash back to its
    * own directory under the adopted modulus. A bounded read (≤ 3 shard
    * directories), not a zone scan: a too-small adopted count fails the
    * name check outright, a divisor-of-the-true-count adoption fails the
    * row check, and spreading the probes across the id range keeps a
    * sparse or unluckily-small single directory from blessing a wrong
    * count by chance (every probe row is checked, none sampled). New
    * zones (no shard directories) verify vacuously.
    */
  private def verifyAdoptedShards(spark: SparkSession, outDir: String,
      n: Int): Unit = {
    val ids = zoneLayoutIds(outDir)
    if (ids.isEmpty) return
    def fail(detail: String): Nothing = throw new IllegalStateException(
      s"export zone $outDir predates shard markers and its layout is " +
        s"inconsistent with the configured count $n ($detail): set " +
        "SPARK_GRAFT_EXPORT_SHARDS to the count the zone was written " +
        "with (maintenance will then persist it), or rebuild the zone")
    if (ids.max >= n) fail(s"directory shard_id=${ids.max} exists")
    VectorOps.register(spark)
    val probes = Seq(ids.head, ids(ids.size / 2), ids.last).distinct
    val sample = readShards(spark, outDir, probes)
    val bad = sample.filter(
      pmod(hash60(concat(lit(IncrementalSalt), col("doc_id").cast("string"))),
        lit(n.toLong)) =!= col("shard_id")).count()
    if (bad > 0)
      fail(s"$bad rows of probe shards ${probes.mkString(",")} hash elsewhere")
  }

  /** Salt of the stable shard key — shared by the incremental export and
    * the targeted delete, which must compute the SAME doc→shard mapping
    * (the delete's pruning correctness rests on it).
    */
  val IncrementalSalt = "graft-export|"

  /** The stable shard of one doc id, driver-side — the JVM twin of the
    * assignment expression in [[writeTrainingShardsIncremental]]
    * (Hash60Util.hash IS the graft_hash60 expression's kernel, so the two
    * cannot disagree). The no-count form uses the creation-time default;
    * maintenance ops use the explicit form with the zone's marker count.
    */
  def shardOf(docId: Long): Long = shardOf(docId, IncrementalShards)

  def shardOf(docId: Long, shards: Int): Long =
    graft.functions.Hash60Util.hash(IncrementalSalt + docId) % shards

  /** INCREMENTAL re-export — the opt-in alternative mode the
    * [[writeTrainingShards]] contract note points at: shard by a STABLE
    * salted content-key hash (t7's mechanism — `hash60(salt||doc_id) mod
    * N`) instead of the t8 dense prefix sum, so adding/dropping/editing a
    * doc moves only that doc's own shard. Re-export then rewrites ONLY the
    * shards whose content changed:
    *
    *  - a per-shard order-independent fingerprint (`bit_xor` of a row
    *    content hash, plus the row count — xor alone cancels on paired
    *    rows) is computed in the same single pass that stages the export;
    *    the fingerprint aggregate collects N rows (shard count, not data);
    *  - fingerprints are compared against `_graft_manifest.tsv` from the
    *    previous export (underscore-prefixed: Spark's file index ignores
    *    it, so readers of the zone never see it as data);
    *  - only changed shards are written, under per-partition DYNAMIC
    *    overwrite — untouched shard directories are never listed, read, or
    *    rewritten (their files keep their mtimes: the spec pins this);
    *  - shards that became EMPTY (every doc dropped) write no rows, so
    *    dynamic overwrite cannot clear them — their directories are
    *    deleted explicitly from the old-manifest diff.
    *
    * Trade-off vs the default mode, per the contract note: per-shard token
    * mass is now only ~uniform in expectation (hash balance), not bounded
    * by construction. `maxRecordsPerFile` still bounds individual files.
    * Idempotent: re-export of an unchanged corpus rewrites zero shards.
    */
  def writeTrainingShardsIncremental(spark: SparkSession, dir: String,
      outDir: String, requestedShards: Option[Int] = None): DataFrame = {
    VectorOps.register(spark) // graft_hash60
    val nShards = resolveZoneShards(spark, outDir, requestedShards)
    val docs = graft.core.Tables(spark, dir).documents
      .select("doc_id", "text", "lang", "source")
    val assigned = docs.withColumn("shard_id",
      pmod(hash60(concat(lit(IncrementalSalt), col("doc_id").cast("string"))),
        lit(nShards.toLong)))
    // stage once: fingerprint pass + (filtered) write pass share the scan
    assigned.persist()
    try {
      val fps = fingerprints(assigned)
      val prev = readManifest(outDir)
      val changed = fps.keys.filter(k => !prev.get(k).contains(fps(k))).toSeq.sorted
      if (changed.nonEmpty)
        // dynamic = replace ONLY the partitions present in the frame
        writeShardPartitions(assigned.filter(col("shard_id").isin(changed: _*)),
          outDir, "dynamic")
      // shards the previous export had that now hold zero rows: dynamic
      // overwrite never saw them — drop their directories
      for (gone <- prev.keySet -- fps.keySet) dropShardDir(outDir, gone)
      // the export is the zone-creating writer: a brand-new zone gets its
      // marker here, at the moment data materializes (resolveZoneShards
      // deliberately does not conjure one for layoutless paths)
      if (zoneShards(outDir).isEmpty) writeShardsMarker(outDir, nShards)
      writeManifest(outDir, fps)
    } finally assigned.unpersist()
    assigned
  }

  /** TARGETED DELETE (right-to-be-forgotten) over an incremental export
    * zone: remove the given doc ids from the shards WITHOUT scanning the
    * zone — the stable shard key makes each victim's shard computable
    * driver-side, so the job reads ONLY the victims' shard directories
    * and rewrites only those that actually lost a row (an id absent from
    * the zone leaves its shard's fingerprint, and therefore its files,
    * untouched). A GDPR request of any realistic size touches a handful
    * of the N shards; every other directory is never listed, read, or
    * rewritten — same untouched-mtime contract as the incremental export,
    * the spec pins it.
    *
    * The victim list is a DRIVER-side Seq by design: deletion requests are
    * human-scale (thousands of ids, not billions) — the same driver-side-
    * metadata precedent as this file's 16-row fingerprint collect. A
    * corpus-scale delete (drop a whole source) is not this operator; that
    * is a re-export with the source filtered upstream.
    *
    * The manifest is updated to the POST-delete fingerprints of the
    * rewritten shards, which keeps the next incremental export honest: a
    * source that still contains the victims will show those shards as
    * changed (and reinstate them — the zone delete is for when the source
    * of truth dropped them first, or the zone outlives its source);
    * unaffected shards still fingerprint-match and skip.
    *
    * A shard emptied by the delete is removed entirely (dynamic overwrite
    * writes nothing for it — same explicit-directory-drop as the
    * incremental export's emptied-shard path).
    */
  def deleteFromShards(spark: SparkSession, outDir: String,
      docIds: Seq[Long]): Unit = {
    if (docIds.isEmpty) return
    val nShards = resolveZoneShards(spark, outDir, None)
    val affected = docIds.distinct.map(shardOf(_, nShards)).distinct.sorted
    val victims = docIds.toSet
    val preOp = readShards(spark, outDir, affected)
    val kept = preOp.filter(!col("doc_id").isin(victims.toSeq: _*))
    rewriteAffectedShards(spark, outDir, nShards, affected, preOp, kept)
  }

  /** Row-level UPSERT (MERGE INTO) over an incremental export zone: the
    * upsert frame's rows REPLACE same-id rows and ADD new ids, touching
    * only the shards the stable hash maps those ids to -- the row-granular
    * completion of the zone-maintenance family (incremental re-export is
    * source-driven and corpus-shaped; this is delta-driven and
    * delta-shaped, the MERGE a CDC upsert feed like st12's lands with).
    *
    * Unlike the delete, the upsert payload is DATA-sized, so nothing about
    * it goes through the driver except the affected shard-id list (at most
    * [[IncrementalShards]] values): the replace is a distributed left-anti
    * join of the affected shards' rows against the upsert keys, then a
    * union with the upserts. Idempotent by fingerprint: re-landing the
    * same upsert finds every affected shard's post-merge fingerprint equal
    * to the manifest and rewrites nothing (the redelivery contract,
    * spec-pinned).
    *
    * Precondition: `doc_id` is unique WITHIN the upsert frame (standard
    * MERGE semantics — a batch with two rows for one key has no
    * well-defined winner; collapse upstream, e.g. st12's max-version
    * collapse, before landing). Duplicate keys are landed as-is.
    */
  def upsertShards(spark: SparkSession, outDir: String,
      upserts: DataFrame): Unit = {
    VectorOps.register(spark)
    val nShards = resolveZoneShards(spark, outDir, None)
    val up = upserts
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("lang"), col("source"))
      .withColumn("shard_id",
        pmod(hash60(concat(lit(IncrementalSalt), col("doc_id").cast("string"))),
          lit(nShards.toLong)))
    up.persist()
    try {
      // MERGE keys must be non-null: a null (or non-numeric, cast-to-null)
      // doc_id yields a null shard_id, which the affected-id collect would
      // coerce to 0, the fingerprint map would mis-key, and the changed-
      // shard write filter would silently drop — reject the batch loudly
      val nullKeys = up.filter(col("doc_id").isNull).count()
      require(nullKeys == 0, s"upsert batch contains $nullKeys rows whose " +
        "doc_id is null or not castable to long - MERGE keys must be non-null")
      val affected = up.select("shard_id").distinct()
        .collect().map(_.getAs[Long]("shard_id")).sorted.toSeq
      val existing = readShards(spark, outDir, affected)
      val kept = existing.join(up.select("doc_id"), Seq("doc_id"), "left_anti")
      rewriteAffectedShards(spark, outDir, nShards, affected, existing,
        kept.unionByName(up.select(kept.columns.map(col): _*)))
    } finally up.unpersist()
  }

  /** RE-SHARD an incremental export zone in place: migrate it from its
    * current persisted shard count to `newShards` — the operation the r11
    * scale study proved necessary (maintenance cost = |affected| ×
    * zone/shards, so the count must grow with the corpus; it is fixed per
    * zone lifetime, and this is the one legal way to change it).
    *
    * One read of the zone, one stable-hash reassignment (the SAME salted
    * key — only the modulus changes), one write: the new layout is staged
    * to a sibling temp directory with its manifest and shard marker
    * rebuilt in the same pass, then swapped in (rename live away, rename
    * staging in, drop the old). The guarantee is CRASH-consistency, not
    * reader atomicity: a crash leaves either the old zone or the new one
    * (plus debris the next run cleans up), and a reader never observes a
    * half-migrated MIX — but between the two renames the zone path
    * briefly does not exist, so a concurrent reader can fail on a missing
    * path (and [[zoneShards]] returns None). Quiesce readers for the
    * migration window, as for any table swap. Re-running at the zone's
    * current count is a no-op (nothing read, nothing written); re-running
    * after a crash restarts from whichever layout survived. Unlike
    * delete/upsert the cost is deliberately zone-sized — it IS the
    * migration — but flat in the target shard count (same rows, one
    * rebalance).
    */
  def reshard(spark: SparkSession, outDir: String, newShards: Int): Unit = {
    require(newShards >= 1, s"newShards must be >= 1, got $newShards")
    val tmp = outDir + ".__reshard__"
    val old = outDir + ".__reshard_old__"
    // crash debris: staging is never the source of truth — drop it; an
    // orphaned old layout NEXT TO a live dir means a prior run finished
    // its swap but not the cleanup — drop it; an old layout WITHOUT a
    // live dir means the crash hit between the two renames — roll back
    graft.core.FsUtil.deleteRecursively(tmp)
    if (new File(old).isDirectory) {
      if (new File(outDir).isDirectory) graft.core.FsUtil.deleteRecursively(old)
      else Files.move(Paths.get(old), Paths.get(outDir))
    }
    // a migration needs a zone: refuse a path that holds neither data nor
    // metadata rather than conjuring an empty marker-only directory
    require(new File(outDir).isDirectory,
      s"reshard target $outDir does not exist - nothing to migrate")
    val cur = zoneShards(outDir).getOrElse {
      // legacy-zone adoption verifies like resolveZoneShards: an adopted
      // count that happens to equal newShards would otherwise no-op AND
      // persist a wrong marker
      val n = IncrementalShards
      verifyAdoptedShards(spark, outDir, n)
      writeShardsMarker(outDir, n)
      n
    }
    if (cur == newShards) return
    VectorOps.register(spark)
    val content = readZone(spark, outDir)
      .drop("shard_id")
      .withColumn("shard_id",
        pmod(hash60(concat(lit(IncrementalSalt), col("doc_id").cast("string"))),
          lit(newShards.toLong)))
    content.persist()
    try {
      val fps = fingerprints(content)
      if (fps.nonEmpty) writeShardPartitions(content, tmp, "static")
      writeManifest(tmp, fps)
      writeShardsMarker(tmp, newShards)
      Files.move(Paths.get(outDir), Paths.get(old))
      Files.move(Paths.get(tmp), Paths.get(outDir))
      graft.core.FsUtil.deleteRecursively(old)
    } finally content.unpersist()
  }

  /** Per-shard order-independent fingerprints of `content` (`bit_xor` of
    * a row content hash, plus the row count — xor alone cancels on paired
    * rows): at most the zone's shard count of driver rows, not data. The
    * shared kernel of the incremental export, delete/upsert rewrite, and
    * reshard — all four MUST fingerprint identically or the
    * changed-shard diff misfires.
    */
  private def fingerprints(content: DataFrame): Map[Long, (Long, Long)] = {
    // INJECTIVE row encoding: length-prefix each field (len:value, null ->
    // N) -- a separator-joined concat_ws silently skips nulls and lets
    // field content shift across boundaries, so (text=null, lang="x")
    // collided with (text="x", lang=null) and a real change went
    // undetected; the length prefix makes the encoding uniquely parseable
    def enc(c: org.apache.spark.sql.Column) =
      coalesce(concat(length(c), lit(":"), c), lit("N"))
    content
      .withColumn("row_fp", hash60(concat(
        enc(col("doc_id").cast("string")), enc(col("text")),
        enc(col("lang")), enc(col("source")))))
      .groupBy("shard_id")
      .agg(expr("bit_xor(row_fp)").as("fp"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[Long]("shard_id") ->
        (r.getAs[Long]("fp"), r.getAs[Long]("n"))).toMap
  }

  /** Read EVERY shard directory of a zone — the reshard's one full read;
    * maintenance ops never use this (they read only affected shards).
    */
  private def readZone(spark: SparkSession, outDir: String): DataFrame =
    readShards(spark, outDir, zoneLayoutIds(outDir))

  /** Read ONLY the given shard directories of a zone (skipping ids whose
    * directory does not exist yet -- an upsert may target an empty shard);
    * basePath re-derives the shard_id partition column from the paths.
    */
  private def readShards(spark: SparkSession, outDir: String,
      shardIds: Seq[Long]): DataFrame = {
    val dirs = shardIds.map(k => s"$outDir/shard_id=$k")
      .filter(p => new File(p).isDirectory)
    if (dirs.isEmpty) {
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType),
          StructField("lang", StringType), StructField("source", StringType),
          StructField("shard_id", LongType))))
    } else spark.read
      .option("basePath", outDir)
      .json(dirs: _*)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("lang"), col("source"), col("shard_id").cast("long").as("shard_id"))
  }

  /** Shared tail of [[deleteFromShards]]/[[upsertShards]]: given the
    * post-operation content of the AFFECTED shards, fingerprint it (at
    * most [[IncrementalShards]] driver rows, not data), rewrite only the
    * shards whose fingerprint actually changed, drop the ones whose
    * directory existed and emptied, and update the manifest -- so an id
    * absent from the zone (delete) or a byte-identical redelivery
    * (upsert) leaves every file and mtime untouched. The honest cost is
    * READ |affected shards|, REWRITE |shards that changed|. An op that
    * touches nothing on a path with no prior manifest also WRITES
    * nothing: a delete aimed at a nonexistent or mistyped zone stays a
    * pure no-op instead of conjuring metadata there (an upsert that lands
    * rows is zone CREATION, and persists the marker with its manifest).
    */
  private def rewriteAffectedShards(spark: SparkSession, outDir: String,
      nShards: Int, affected: Seq[Long], preOp: DataFrame,
      content: DataFrame): Unit = {
    content.persist()
    try {
      val fps = fingerprints(content)
      val prevAll = readManifest(outDir)
      // diff basis: the manifest where it knows the shard; for affected
      // shards a pre-manifest (legacy) zone holds but the manifest does
      // not list, fingerprint their PRE-op rows — with an empty basis
      // every affected shard would read as changed and rewrite
      // byte-identically, breaking the untouched-mtime contract (the
      // first maintenance op on a legacy zone seeds manifest entries for
      // its affected shards; the next full export completes the rest)
      val missing = affected.filter(k => !prevAll.contains(k) &&
        new File(outDir, s"shard_id=$k").isDirectory)
      val basis = if (missing.isEmpty) prevAll
        else prevAll ++ fingerprints(
          preOp.filter(col("shard_id").isin(missing: _*)))
      val changed = fps.keySet.filter(k => !basis.get(k).contains(fps(k)))
      if (changed.nonEmpty)
        writeShardPartitions(content.filter(col("shard_id").isin(changed.toSeq: _*)),
          outDir, "dynamic")
      // emptied = affected shards with no surviving rows whose directory
      // exists (to drop) OR that the manifest still lists (to prune — a
      // crash between a prior run's directory drop and its manifest write
      // leaves a phantom entry; this run self-heals it). An affected id
      // that never had a directory or manifest row (nonexistent zone, or
      // an upsert key hashing to a never-written shard) is not an event.
      val emptied = affected.filter(k => !fps.contains(k) &&
        (prevAll.contains(k) || new File(outDir, s"shard_id=$k").isDirectory))
      emptied.foreach(dropShardDir(outDir, _))
      if (changed.nonEmpty || emptied.nonEmpty ||
          Files.exists(Paths.get(outDir, ManifestName))) {
        if (zoneShards(outDir).isEmpty) writeShardsMarker(outDir, nShards)
        writeManifest(outDir, prevAll -- emptied ++ fps)
      }
    } finally content.unpersist()
  }

  /** Manifest name; the leading underscore keeps it invisible to Spark's
    * file listing, so `spark.read.json(outDir)` sees only shard data.
    */
  private val ManifestName = "_graft_manifest.tsv"

  private def readManifest(outDir: String): Map[Long, (Long, Long)] = {
    val p = Paths.get(outDir, ManifestName)
    if (!Files.exists(p)) Map.empty
    else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).map { line =>
        val Array(k, fp, n) = line.split("\t")
        k.toLong -> (fp.toLong, n.toLong)
      }.toMap
  }

  private def writeManifest(outDir: String,
      fps: Map[Long, (Long, Long)]): Unit =
    writeMetaFile(outDir, ManifestName, fps.toSeq.sortBy(_._1)
      .map { case (k, (fp, n)) => s"$k\t$fp\t$n" }.mkString("", "\n", "\n"))
}
