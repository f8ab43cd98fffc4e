package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** THE STORE'S INCREMENTAL PROFILE ARTIFACT — the product wiring of
  * the mergeable-sketch tier (q185/q186/q187): `Main profile` used to
  * rescan the whole chunks table AND re-tokenize the corpus for the
  * zipf slope on every call, while the engine already shipped the
  * mergeable state that makes the refresh batch-sized
  * ([[Profile.mergeSketchStates]] / [[Profile.mergeHistograms]] /
  * [[Profile.mergeCmsSketches]]). This module is that state as a
  * store artifact: every `Main.ingestBatch` folds its batch's DELTA
  * in (read stored → merge → commit, never a rescan of history) and
  * `Main profile` serves the report from it — at 100 TB a cron'd
  * profile reads a register/histogram/sketch-sized artifact instead
  * of paying a daily corpus scan.
  *
  * Four parts, one per report family, each under its own merge law:
  *
  *  - `hist`  (strategy, bin, cnt): the log2 length histogram behind
  *    the per-strategy quantiles — counts ADD, so batch deltas fold
  *    and demotions SUBTRACT exactly (the q186 contract).
  *  - `vocab` (term, freq): the zipf-slope term table
  *    ([[TextStats.termFrequencies]], whitespace tokens) — additive,
  *    subtractable, vocabulary-sized (corpus-sublinear).
  *  - `cms`   (j, bucket, cnt): the Count-Min sketch over the `\W+`
  *    lowercase token model — additive, subtractable, d·w rows
  *    forever; serves `--token=` point estimates (the q187 contract).
  *  - `regs`  (strategy, bucket, m_reg, occ): the HLL register state
  *    ([[Profile.sketchState]]) behind the distinct-token estimate.
  *    Registers merge by MAX — idempotent under re-ingest but NOT
  *    subtractable (HLL deletion is impossible in general), so this
  *    part is HISTORY-MONOTONE: after a demotion the served estimate
  *    is an upper bound on a live-store recount (estimate monotone in
  *    pointwise registers) until a `--rebuild` resets it. DECIDED
  *    demotion semantics, spec-pinned in E2eMainSpec: the additive
  *    report lines stay bit-identical to a rescan through demotions;
  *    the register line reads "distinct tokens ever kept".
  *
  * Consistency across crash windows is by FINGERPRINT, the vector
  * index's reconcile philosophy applied to a sketch that cannot diff
  * ids: the artifact records the chunks-table DIRECTORY LISTING it
  * summarizes (names + sizes — every commit writes fresh part files,
  * so any table swap changes it; no data scan). A fold is only
  * applied when the stored fingerprint matches the pre-commit
  * listing; any divergence — a crash between the chunks commit and
  * the artifact commit, a compact/repair that rewrote files, a
  * foreign writer — is DETECTED on the next touch and healed by a
  * rebuild from the live table. Readers fall back to a rescan on
  * mismatch, so a stale artifact can never serve a wrong report.
  */
object ProfileState {

  val ArtifactName = "profile_state.parquet"

  def artifactPath(storeDir: String): String = s"$storeDir/$ArtifactName"

  /** The four stored parts as frames (see the object doc for schemas
    * and merge laws).
    */
  case class Parts(hist: DataFrame, regs: DataFrame, cms: DataFrame,
                   vocab: DataFrame)

  /** The `\W+` lowercase token model the regs/cms parts share —
    * [[Profile.distinctTokenProfile]]'s convention, and the one
    * `--token=` probes are normalized into.
    */
  private def sketchTokens(chunks: DataFrame): DataFrame =
    chunks.select(
      col("strategy"),
      explode(filter(split(lower(coalesce(col("content"), lit(""))), "\\W+"),
                     t => t =!= "")).as("__tok"))

  /** Build all four parts from a chunks frame — the one-shot form
    * (a full-table rebuild) AND the per-batch delta (the same code on
    * the batch's kept chunks): one definition, so the fold and the
    * rescan cannot drift.
    */
  def fromChunks(chunks: DataFrame): Parts = {
    val toks = sketchTokens(chunks)
    Parts(
      hist = Profile.lengthHistogram(
        chunks.withColumn("len", length(col("content"))), "strategy", "len"),
      regs = Profile.sketchState(toks, "strategy", "__tok"),
      cms = Profile.cmsSketch(toks.select(col("__tok").as("token")), "token"),
      vocab = TextStats.termFrequencies(chunks, "content"))
  }

  /** The additive parts with their counts NEGATED — the exact-
    * subtraction side of a fold (demoted / re-ingested docs' stored
    * chunks leave the profile the way they left the table). The
    * register part is emptied, never negated: registers do not
    * subtract (see the object doc).
    */
  private def negate(p: Parts): Parts = Parts(
    hist = p.hist.withColumn("cnt", -col("cnt")),
    regs = p.regs.limit(0),
    cms = p.cms.withColumn("cnt", -col("cnt")),
    vocab = p.vocab.withColumn("freq", -col("freq")))

  /** Fold any number of parts under each family's merge law.
    * Subtract-to-zero rows are dropped, so a fold that removes a
    * doc's last occurrence of a bin/bucket/term converges to exactly
    * the rows a rescan would produce.
    */
  def merge(parts: Parts*): Parts = Parts(
    hist = Profile.mergeHistograms("strategy", parts.map(_.hist): _*)
      .filter(col("cnt") =!= 0L),
    regs = Profile.mergeSketchStates("strategy", parts.map(_.regs): _*),
    cms = Profile.mergeCmsSketches(parts.map(_.cms): _*)
      .filter(col("cnt") =!= 0L),
    vocab = parts.map(_.vocab).reduce(_.unionByName(_))
      .groupBy(col("term")).agg(sum(col("freq")).as("freq"))
      .filter(col("freq") =!= 0L))

  /** One ingest batch's fold: stored state (absent for a fresh store)
    * + the batch's kept chunks − the stale stored chunks the commit
    * replaced or pruned (demotions and re-ingested docs — the same
    * stale set the postings maintenance swaps out).
    */
  def fold(old: Option[Parts], addChunks: DataFrame,
           subChunks: Option[DataFrame]): Parts =
    merge((old.toSeq :+ fromChunks(addChunks)) ++
      subChunks.map(s => negate(fromChunks(s))): _*)

  /** PRE-commit half of the maintenance both chunk-table writers
    * (ingest, delete) share: is the stored state in sync with the
    * table about to be rewritten — i.e. is a fold valid — and if so,
    * what is the base. A fresh store (no table yet) folds from empty;
    * an absent or out-of-sync artifact means "rebuild after commit".
    */
  def preCommitGate(spark: SparkSession, storeDir: String,
                    chunksDir: java.io.File): (Boolean, Option[Parts]) =
    if (!chunksDir.exists()) (true, None)
    else read(spark, storeDir) match {
      case Some((p, fp)) if fp == dirFingerprint(chunksDir) => (true, Some(p))
      case _ => (false, None)
    }

  /** POST-commit half: fold the writer's add/subtract deltas onto the
    * gated base (or rebuild from the freshly-committed table when the
    * gate said out-of-sync) and commit with the post-commit
    * fingerprint — one definition, so ingest's and delete's fold
    * semantics cannot drift.
    */
  def commitAfterChunks(spark: SparkSession, storeDir: String,
                        chunksDir: java.io.File, foldable: Boolean,
                        oldParts: Option[Parts], addChunks: DataFrame,
                        subChunks: Option[DataFrame],
                        rebuildFrom: => DataFrame): Unit = {
    val newFp = dirFingerprint(chunksDir)
    // pin the (strategy, content) input ONCE: the four part writes are
    // four actions, and an unpinned input would re-chunk/re-tokenize
    // per part (4 batch passes on the fold path, 4 table scans on the
    // rebuild path); the pin is released with the commit
    val base = (if (foldable) addChunks else rebuildFrom)
      .select(col("strategy"), col("content")).localCheckpoint(true)
    try {
      val parts =
        if (foldable) fold(oldParts, base, subChunks)
        else fromChunks(base)
      graft.io.Faults.point("profileState.before-commit")
      write(spark, storeDir, parts, newFp)
    } finally graft.io.Pins.release(base)
  }

  /** Deterministic identity of a table directory: md5 over the sorted
    * (relative-path, length) listing. Every swap commit in this
    * engine writes fresh part-file names, so any committed change —
    * and any compact/repair rewrite — changes the fingerprint; no
    * data is read.
    */
  def dirFingerprint(dir: java.io.File): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    val lines = walk(dir)
      .map(f => s"${dir.toPath.relativize(f.toPath)}:${f.length()}")
      .sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(lines.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private val SyncFile = "_sync"

  /** Commit the artifact (all four parts + the fingerprint of the
    * chunks table they summarize) through the shared tmp +
    * aside-rename protocol — one atomic swap for the whole artifact,
    * fault-pointed like every other commit.
    */
  def write(spark: SparkSession, storeDir: String, parts: Parts,
            fingerprint: String): Unit =
    Tables.commitArtifact(artifactPath(storeDir)) { tmp =>
      parts.hist.coalesce(1).write.mode("overwrite").parquet(s"$tmp/hist")
      parts.regs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/regs")
      parts.cms.coalesce(1).write.mode("overwrite").parquet(s"$tmp/cms")
      // vocabulary-sized (not register-bounded) — keep the writer's
      // parallelism; every other part is ≤ a few hundred rows
      parts.vocab.write.mode("overwrite").parquet(s"$tmp/vocab")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tmp, SyncFile),
        fingerprint.getBytes("UTF-8"))
    }

  /** Read the stored artifact with the writer-crash preamble (a
    * commit that died between aside-rename and commit parked the only
    * copy in `.trash`). Returns the parts and the recorded
    * fingerprint; None when absent or structurally incomplete (a
    * crashed pre-protocol writer) — callers treat both as "rebuild".
    */
  def read(spark: SparkSession, storeDir: String)
      : Option[(Parts, String)] = {
    val f = new java.io.File(artifactPath(storeDir))
    Tables.restoreFromTrash(f.toString)
    val sync = new java.io.File(f, SyncFile)
    val complete = f.isDirectory && sync.isFile &&
      Seq("hist", "regs", "cms", "vocab")
        .forall(p => new java.io.File(f, p).isDirectory)
    if (!complete) None
    else Some((
      Parts(
        hist = spark.read.parquet(s"$f/hist"),
        regs = spark.read.parquet(s"$f/regs"),
        cms = spark.read.parquet(s"$f/cms"),
        vocab = spark.read.parquet(s"$f/vocab")),
      new String(java.nio.file.Files.readAllBytes(sync.toPath), "UTF-8").trim))
  }

  /** The stored parts ONLY IF their recorded fingerprint matches the
    * live chunks table — the gate that makes every crash window,
    * foreign rewrite, or missed fold self-announcing: mismatch reads
    * as "absent", and the caller rescans/rebuilds.
    */
  def readSynced(spark: SparkSession, storeDir: String,
                 chunksDir: java.io.File): Option[Parts] =
    read(spark, storeDir).collect {
      case (parts, fp)
          if chunksDir.exists() && fp == dirFingerprint(chunksDir) => parts
    }
}
