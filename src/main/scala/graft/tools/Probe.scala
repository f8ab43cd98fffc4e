package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextStats

/** Dev-only perf probe: stage-level attribution for the near-dup
  * pipelines (not part of the driver surface). Median-of-3 per stage;
  * `SPARK_GRAFT_EXPLAIN=1` prints formatted plans instead.
  *
  * This harness found both round-4 structural wins: the
  * InferFiltersFromGenerate re-evaluation trap (uncached bucket stage
  * 2.8 s vs 0.24 s from a materialized input) and the pair-expansion
  * cost that led to canonical-chunk emission in simhashPairs.
  */
object Probe {

  /** Deterministic synthetic near-dup corpus for the scale curve:
    * every 5-doc group shares a 40-word core plus 10 words unique per
    * doc (pairwise Jaccard ≈ 0.66 within a group — above the 4-band
    * LSH threshold), so candidate pairs / clusters grow LINEARLY in n
    * by construction and any super-linear growth measured is the
    * operator's fault, not the data's.
    */
  def syntheticDocs(spark: SparkSession, n: Long): org.apache.spark.sql.DataFrame =
    spark.range(n).select(
      concat(lit("d"), lpad(col("id").cast("string"), 8, "0")).as("doc_id"),
      concat_ws(" ",
        ((0 until 40).map(k =>
           md5(concat((col("id") / 5).cast("long").cast("string"), lit(s"g$k")))) ++
         (0 until 10).map(k =>
           md5(concat(col("id").cast("string"), lit(s"u$k"))))): _*).as("text"))

  case class ScalePoint(factor: Int, nDocs: Long, nPairs: Long, nClusters: Long,
                        tSign: Double, tPairs: Double, tClusters: Double,
                        tIncr: Double)

  /** Measured scale curve for the dedup chain (q24 candidates, q59
    * clustering, q73 incremental probe) over 1×/10×/100× synthetic
    * corpora — the evidence behind the "linear in corpus size"
    * comments. Each stage is timed to a count action over a
    * MATERIALIZED input (generation excluded); `reps` runs, median
    * kept.
    */
  /** Median-of-`reps` wall-clock for an action returning a count —
    * the one timer every curve and the CLI mode share.
    */
  private def medOf(reps: Int)(f: => Long): (Double, Long) =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }.sortBy(_._1).apply((reps - 1) / 2)

  def dedupScaleCurve(spark: SparkSession, base: Long,
                      factors: Seq[Int] = Seq(1, 10, 100),
                      reps: Int = 3): Seq[ScalePoint] = {
    def med(f: => Long): (Double, Long) = medOf(reps)(f)
    factors.map { fac =>
      val n = base * fac
      val docs = syntheticDocs(spark, n).localCheckpoint(true)
      // the incremental probe: last 10% arrives as the new batch
      val cut = s"d${"%08d".format(n - n / 10)}"
      val stored = graft.dedup.Dedup
        .minhashSignatures(docs.filter(col("doc_id") < cut), "doc_id", "text")
        .localCheckpoint(true)
      val newSigs = graft.dedup.Dedup
        .minhashSignatures(docs.filter(col("doc_id") >= cut), "doc_id", "text")
        .localCheckpoint(true)
      val (tSign, _) = med {
        graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text").count()
      }
      val (tPairs, nPairs) = med {
        Dedup.minhashCandidates(docs, "doc_id", "text").count()
      }
      val (tClusters, nClusters) = med {
        Dedup.dupClusters(docs, "doc_id",
            Dedup.minhashCandidates(docs, "doc_id", "text"), "a_id", "b_id")
          .select(countDistinct(col("comp"))).head().getLong(0)
      }
      val (tIncr, _) = med {
        Dedup.incrementalCandidates(newSigs, stored).count()
      }
      docs.unpersist(); stored.unpersist(); newSigs.unpersist()
      graft.io.Pins.sweepAll(spark) // clustering's label pins
      ScalePoint(fac, n, nPairs, nClusters, tSign, tPairs, tClusters, tIncr)
    }
  }

  /** Synthetic CLUSTERED embeddings: `n` vectors, 64 dims, 32
    * well-separated clusters with small deterministic per-vector
    * jitter — real angular structure for IVF cells (the driver's
    * testdata embeddings are near-iid, which caps what a probe can
    * show). Cluster c's exact integer centroid on the 1e-3 grid is
    * (((c+1)·37 + d·101) % 19 − 9)·100 — [[annScaleCurve]] uses it
    * directly. Each cluster's direction is hash-like per (c, d): 32
    * near-orthogonal directions in 64 dims, so dot-product cell
    * assignment resolves clusters (a magnitude-only construction would
    * collapse every vector into the two extreme cells).
    */
  def syntheticEmbeddings(spark: SparkSession, n: Long): org.apache.spark.sql.DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        ((((col("id") % 32 + 1) * 37 + d * 101) % 19 - 9).cast("double") / 10.0 +
         ((col("id") * 31 + d * 17) % 13 - 6).cast("double") / 1000.0)
          .cast("float")).as("embedding"))

  case class AnnScalePoint(factor: Int, nVecs: Long, probedRows: Long,
                           tBuild: Double, tProbe: Double, tBrute: Double)

  /** Measured scale curve for the stored IVF-PQ stack: index build
    * (assign + PQ-encode + cell-partitioned write) and the stored
    * probe (partition-pruned, codes-only ADC scan, point-fetch
    * re-rank) against the exact brute-force scan, over 1×/10×/100×
    * corpora. The structural claim the numbers back: the probe touches
    * a CONSTANT FRACTION of rows (nprobe/k cells) at every scale while
    * build stays linear — so probe/brute wall-clock falls toward the
    * scanned fraction as per-job overhead amortizes.
    */
  def annScaleCurve(spark: SparkSession, base: Long,
                    factors: Seq[Int] = Seq(1, 10, 100),
                    reps: Int = 3): Seq[AnnScalePoint] = {
    import graft.search.Ann
    val dims = 64
    val centroids: Seq[(Long, Seq[Long])] = (0L until 32L).map { c =>
      (c, (0 until dims).map(d => (((c + 1) * 37 + d * 101) % 19 - 9) * 100L))
    }
    def med(f: => Long): (Double, Long) = medOf(reps)(f)
    val nprobe = 2
    factors.map { fac =>
      val n = base * fac
      val emb = syntheticEmbeddings(spark, n).localCheckpoint(true)
      val qvF = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toSeq
      val qv = qvF.map(Ann.quantizeL)
      val dir = java.nio.file.Files.createTempDirectory("graft_annscale")
        .toString + "/index"
      val (tBuild, _) = med {
        graft.io.Tables.rmTree(new java.io.File(dir))
        Ann.ivfPqWriteIndex(emb, "vec_id", "embedding", centroids, centroids, dir)
        n
      }
      val probedRows = {
        val probed = Ann.ivfAssignInt(emb, "embedding", centroids)
          .groupBy(col("cell")).count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // the probe's OWN cell ranking — a reimplementation here would
        // silently drift from what ivfPqTopKStored actually scans
        Ann.rankCells(centroids, qv, nprobe).map(probed.getOrElse(_, 0L)).sum
      }
      val (tProbe, _) = med {
        Ann.ivfPqTopKStored(spark, dir, "vec_id", "embedding",
                            centroids, centroids, qv,
                            k = 10, nprobe = nprobe).count()
      }
      // like-for-like: brute reads the SAME stored table (all cells,
      // full vectors) — timing the pinned in-memory corpus instead
      // would flatter the index
      val (tBrute, _) = med {
        Ann.intDotTopK(
          spark.read.parquet(dir).withColumn("cell", col("cell").cast("long")),
          "vec_id", "embedding", qvF.map(_.toFloat), k = 10).count()
      }
      emb.unpersist(true)
      graft.io.Pins.sweepAll(spark) // localCheckpoint pins don't release via unpersist
      graft.io.Tables.rmTree(new java.io.File(dir).getParentFile)
      AnnScalePoint(fac, n, probedRows, tBuild, tProbe, tBrute)
    }
  }

  /** Synthetic word-doc corpus for the search curve: `wordsPerDoc`
    * words per doc, word k of doc i = "w"+((31i+7k) mod 1000) — a
    * 1000-term vocabulary with uniform term frequencies, and the probe
    * phrase "w0 w7" (consecutive by construction: +7 per position)
    * occurs in a fixed fraction of docs at every scale (7 is coprime
    * to 1000, so k0(i) ≡ −31i·7⁻¹ mod 1000 lands under wordsPerDoc
    * for wordsPerDoc/1000 of ids), so match counts grow linearly and
    * any super-linear probe time is the operator's fault.
    */
  def syntheticWordDocs(spark: SparkSession, n: Long,
                        wordsPerDoc: Int = 50): org.apache.spark.sql.DataFrame =
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until wordsPerDoc).map(k =>
        concat(lit("w"), ((col("id") * 31 + k * 7) % 1000).cast("string"))): _*)
        .as("text"))

  case class SearchScalePoint(factor: Int, nDocs: Long, postingsRows: Long,
                              probedRows: Long, nMatches: Long,
                              tBuild: Double, tStored: Double, tInline: Double)

  /** Measured scale curve for the STORED POSTINGS phrase index vs the
    * inline phrase scan, over 1×/10×/100× corpora. Build = tokenize +
    * posexplode + term-bucket-partitioned write; stored probe =
    * PartitionFilters-pruned bucket read + anchor votes; inline = the
    * full-corpus tokenize+filter+vote (`phraseOccurrences`) reading the
    * SAME on-disk docs parquet (like-for-like: a pinned in-memory
    * corpus would flatter the inline side). The structural claim: the
    * probe reads a CONSTANT FRACTION of postings (the phrase terms'
    * buckets, ≈ ¦distinct terms¦/nBuckets of the rows under uniform
    * term frequencies) at every scale, while the inline scan re-pays
    * tokenizing the whole corpus per query.
    *
    * `nBuckets` is the WRITER'S layout knob, sized to the index like
    * IVF's nlist: at 10⁸ postings rows, 64 buckets leaves ~2/64 of the
    * index in the probed slice — more rows than the whole corpus'
    * inline tokenize at a 1000-term vocabulary — while 1024 buckets
    * cuts the slice under 0.3%. The CLI probe measures the scaled
    * layout; the default stays at the writer's default.
    */
  def searchScaleCurve(spark: SparkSession, base: Long,
                       factors: Seq[Int] = Seq(1, 10, 100),
                       reps: Int = 3,
                       nBuckets: Int = 64,
                       wordsPerDoc: Int = 50): Seq[SearchScalePoint] = {
    import graft.search.Search
    val phrase = "w0 w7"
    def med(f: => Long): (Double, Long) = medOf(reps)(f)
    factors.map { fac =>
      val n = base * fac
      val tmp = java.nio.file.Files.createTempDirectory("graft_searchscale")
      val docsPath = s"$tmp/docs"
      val idxPath = s"$tmp/postings"
      try {
        syntheticWordDocs(spark, n, wordsPerDoc).write.parquet(docsPath)
        val docsDisk = spark.read.parquet(docsPath)
        // Each rep writes a FRESH path and the previous rep's tree is
        // deleted OUTSIDE the timed region — mode(overwrite) into one
        // path would delete the existing multi-GB index INSIDE the
        // write job at reps 2+, charging filesystem deletion to tBuild.
        val buildTimes = (1 to reps).map { r =>
          val p = s"$idxPath-r$r"
          val t0 = System.nanoTime()
          Search.writePostings(docsDisk, "doc_id", "text", p, nBuckets)
          val dt = (System.nanoTime() - t0) / 1e9
          if (r > 1) graft.io.Tables.rmTree(new java.io.File(s"$idxPath-r${r - 1}"))
          dt
        }.sorted
        val tBuild = buildTimes((reps - 1) / 2)
        val finalIdx = s"$idxPath-r$reps"
        val stored = spark.read.parquet(finalIdx)
        val postingsRows = stored.count()
        // the buckets the probe opens = the distinct tb values the
        // phrase's terms were WRITTEN to (layout truth, not a
        // reimplementation of the probe's hash)
        val probedBuckets = stored
          .filter(col("tok").isin("w0", "w7"))
          .select(col("tb").cast("long")).distinct()
          .collect().map(_.getLong(0)).toSeq
        val probedRows = stored
          .filter(col("tb").cast("long").isInCollection(probedBuckets)).count()
        val (tStored, nMatches) = med {
          Search.phraseOccurrencesStored(spark, finalIdx, "doc_id", phrase).count()
        }
        val (tInline, nInline) = med {
          Search.phraseOccurrences(docsDisk, "doc_id", "text", phrase).count()
        }
        require(nMatches == nInline,
          s"stored ($nMatches) and inline ($nInline) phrase matches diverged")
        SearchScalePoint(fac, n, postingsRows, probedRows, nMatches,
                         tBuild, tStored, tInline)
      } finally graft.io.Tables.rmTree(tmp.toFile)
    }
  }

  case class LearnScalePoint(factor: Int, nRows: Long, tStump: Double,
                             tReg: Double, tBoost: Double)

  /** Scale curve for the training tier: synthetic rows with a planted
    * split (label flips at a = 50, y steps with a), histogram widths
    * FIXED (97/13 distinct values) so the curve isolates the claim
    * that cost is ONE corpus pass + histogram-bounded tail work —
    * time should grow ~linearly in rows while candidate tables stay
    * constant-size.
    */
  def learnScaleCurve(spark: SparkSession, base: Long,
                      factors: Seq[Int] = Seq(1, 10, 100),
                      reps: Int = 3): Seq[LearnScalePoint] = {
    import org.apache.spark.sql.functions._
    import graft.learn.Learn
    def med(f: => Long): (Double, Long) = medOf(reps)(f)
    factors.map { fac =>
      val n = base * fac
      val df = spark.range(n).select(
          (col("id") % 97).cast("long").as("a"),
          (col("id") % 13).cast("long").as("b"),
          ((col("id") % 97) * 7 + (col("id") % 29)).cast("long").as("y"))
        .withColumn("lab", when(col("a") >= 50, 1L).otherwise(-1L))
        .localCheckpoint()
      val (tStump, _) = med {
        Learn.trainStump(df, Seq("a", "b"), "lab").count()
      }
      val (tReg, _) = med {
        Learn.trainRegressionStump(df, Seq("a", "b"), "y",
                                   scale = 1000L).count()
      }
      val (tBoost, _) = med {
        Learn.boostStumps(df, Seq("a", "b"), "y", rounds = 2,
                          gainScale = 1000L).count()
      }
      df.unpersist(true)
      graft.io.Pins.sweepAll(spark)
      LearnScalePoint(fac, n, tStump, tReg, tBoost)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Same session pins as Main/Bench/Verify: Tables.load's
      // TimestampNTZ→Timestamp cast is only value-preserving under UTC,
      // so any probe mode that grows a driver-table read must not shift
      // event times by the host timezone.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
              graft.GraftExtensions.ExcludedOptimizerRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (args.headOption.contains("scale")) {
      val pts = dedupScaleCurve(spark, base = 500)
      val sb = new StringBuilder
      sb ++= "# PROBE — dedup-chain scale curve\n\n"
      sb ++= "Synthetic near-dup corpora (`Probe.syntheticDocs`: 5-doc groups,\n"
      sb ++= "Jaccard ≈ 0.66 in-group), stages timed median-of-3 on local[" + cpus + "].\n\n"
      sb ++= "| factor | docs | cand. pairs | clusters | sign s | q24 pairs s | q59 clusters s | q73 incr s |\n"
      sb ++= "|---|---|---|---|---|---|---|---|\n"
      pts.foreach { p =>
        sb ++= f"| ${p.factor}%d× | ${p.nDocs} | ${p.nPairs} | ${p.nClusters} | ${p.tSign}%.2f | ${p.tPairs}%.2f | ${p.tClusters}%.2f | ${p.tIncr}%.2f |%n"
      }
      val a = pts.head; val z = pts.last
      val rowRatio = z.nDocs.toDouble / a.nDocs
      sb ++= f"%n${rowRatio}%.0f× rows → pairs ${z.nPairs.toDouble / a.nPairs}%.1f×, "
      sb ++= f"q24 ${z.tPairs / a.tPairs}%.1f×, q59 ${z.tClusters / a.tClusters}%.1f×, "
      sb ++= f"q73 ${z.tIncr / a.tIncr}%.1f× time.%n"
      println(sb)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("PROBE_SCALE.md"), sb.toString)
      spark.stop(); return
    }

    if (args.headOption.contains("scale-learn")) {
      val pts = learnScaleCurve(spark, base = 100000L)
      val sb = new StringBuilder
      sb ++= "# PROBE — training-tier scale curve\n\n"
      sb ++= "Synthetic rows with a planted split (label flips at a = 50), 97/13\n"
      sb ++= "distinct feature values so histogram width is FIXED while rows\n"
      sb ++= "grow; median-of-3 on local[" + cpus + "]. Cost claim under test: one\n"
      sb ++= "map-side corpus pass + histogram-bounded tail work per trainer.\n\n"
      sb ++= "| factor | rows | stump s | reg stump s | boost(2) s |\n"
      sb ++= "|---|---|---|---|---|\n"
      pts.foreach { p =>
        sb ++= f"| ${p.factor}%d× | ${p.nRows} | ${p.tStump}%.2f | ${p.tReg}%.2f | ${p.tBoost}%.2f |%n"
      }
      val a = pts.head; val z = pts.last
      sb ++= f"%n${z.nRows.toDouble / a.nRows}%.0f× rows → stump ${z.tStump / a.tStump}%.1f×, "
      sb ++= f"reg ${z.tReg / a.tReg}%.1f×, boost ${z.tBoost / a.tBoost}%.1f× time.%n"
      println(sb)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("PROBE_SCALE_LEARN.md"), sb.toString)
      spark.stop(); return
    }

    if (args.headOption.contains("scale-search")) {
      // Representative geometry: 250-word docs (real documents are
      // KBs — a 50-word corpus makes the inline re-tokenize look
      // artificially cheap) and 256 buckets (the layout knob scales
      // with the index like IVF nlist; 64 is a small-corpus layout,
      // and 1024 dirs cost more in driver-side file listing than the
      // pruning saves at this file count).
      val pts = searchScaleCurve(spark, base = 8000, nBuckets = 256,
                                 wordsPerDoc = 250)
      val sb = new StringBuilder
      sb ++= "# PROBE — stored postings (phrase search) scale curve\n\n"
      sb ++= "Synthetic word docs (`Probe.syntheticWordDocs`: 250 words/doc,\n"
      sb ++= "1000-term uniform vocabulary), phrase \"w0 w7\" (fixed fraction of\n"
      sb ++= "docs match at every scale), median-of-3 on local[" + cpus + "]. Build =\n"
      sb ++= "tokenize + posexplode + 256-term-bucket partitioned write (bucket\n"
      sb ++= "count is the writer's layout knob, sized to the index like IVF\n"
      sb ++= "nlist — at 64 buckets the probed slice of a uniform vocab is\n"
      sb ++= "~2/64 of the index and the stored probe only breaks even);\n"
      sb ++= "stored probe = PartitionFilters-pruned bucket read + anchor\n"
      sb ++= "votes; inline = the full-corpus phrase scan reading the same\n"
      sb ++= "on-disk docs parquet.\n\n"
      sb ++= "| factor | docs | postings | probed rows | probed frac | matches | build s | stored s | inline s | stored/inline |\n"
      sb ++= "|---|---|---|---|---|---|---|---|---|---|\n"
      pts.foreach { p =>
        sb ++= f"| ${p.factor}%d× | ${p.nDocs} | ${p.postingsRows} | ${p.probedRows} | ${p.probedRows.toDouble / p.postingsRows}%.3f | ${p.nMatches} | ${p.tBuild}%.2f | ${p.tStored}%.2f | ${p.tInline}%.2f | ${p.tStored / p.tInline}%.2f |%n"
      }
      val a = pts.head; val z = pts.last
      sb ++= f"%n${z.nDocs.toDouble / a.nDocs}%.0f× rows → probed fraction "
      sb ++= f"${a.probedRows.toDouble / a.postingsRows}%.3f → ${z.probedRows.toDouble / z.postingsRows}%.3f (constant), "
      sb ++= f"build ${z.tBuild / a.tBuild}%.1f× time, stored/inline ${z.tStored / z.tInline}%.2f at ${z.factor}×.%n"
      println(sb)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("PROBE_SCALE_SEARCH.md"), sb.toString)
      spark.stop(); return
    }

    if (args.headOption.contains("scale-ann")) {
      val pts = annScaleCurve(spark, base = 20000)
      val sb = new StringBuilder
      sb ++= "# PROBE — stored IVF-PQ scale curve\n\n"
      sb ++= "Synthetic clustered embeddings (`Probe.syntheticEmbeddings`: 32\n"
      sb ++= "cells, 64 dims), median-of-3 on local[" + cpus + "]. Build = assign +\n"
      sb ++= "PQ-encode + cell-partitioned write; probe = partition-pruned\n"
      sb ++= "codes-only ADC scan + point-fetch re-rank (nprobe=2 of 32 cells);\n"
      sb ++= "brute = exact full-scan top-k.\n\n"
      sb ++= "| factor | vecs | probed rows | probed frac | build s | probe s | brute s | probe/brute |\n"
      sb ++= "|---|---|---|---|---|---|---|---|\n"
      pts.foreach { p =>
        sb ++= f"| ${p.factor}%d× | ${p.nVecs} | ${p.probedRows} | ${p.probedRows.toDouble / p.nVecs}%.3f | ${p.tBuild}%.2f | ${p.tProbe}%.2f | ${p.tBrute}%.2f | ${p.tProbe / p.tBrute}%.2f |%n"
      }
      val a = pts.head; val z = pts.last
      sb ++= f"%n${z.nVecs.toDouble / a.nVecs}%.0f× rows → probed fraction "
      sb ++= f"${a.probedRows.toDouble / a.nVecs}%.3f → ${z.probedRows.toDouble / z.nVecs}%.3f (constant), "
      sb ++= f"build ${z.tBuild / a.tBuild}%.1f× time.%n"
      println(sb)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("PROBE_SCALE_ANN.md"), sb.toString)
      spark.stop(); return
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }.sortBy(_._1).apply(1) match {
        case (s, n) => println(f"PROBE $label%-28s $s%7.2fs  rows=$n")
      }
    }

    val filtered = docs.filter(col("source").isin("src0", "src1"))

    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      println("===== q23 plan =====")
      Dedup.ngramJaccardPairs(filtered, "doc_id", "text", "source", dfCap = 20)
        .explain("formatted")
      println("===== q41 plan =====")
      val sig = Dedup.simhashSignatures(docs, "doc_id", "text",
          keepCols = Seq("source"), bits = 32)
        .withColumnRenamed("simhash", "sh")
      Dedup.simhashPairs(sig, "doc_id", "sh", "source", bits = 32, maxHamming = 3)
        .explain("formatted")
      spark.stop(); return
    }

    // q23 stages
    time("q23:tokens") {
      filtered.select(TextStats.tokens(col("text")).as("toks"))
        .select(size(col("toks")).as("n")).agg(sum("n")).head().getLong(0)
    }
    time("q23:shingles") {
      filtered.select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(array_distinct(Dedup.shinglesOf(col("toks"), 3)).as("sh"))
        .select(size(col("sh")).as("n")).agg(sum("n")).head().getLong(0)
    }
    time("q23:full") {
      Dedup.ngramJaccardPairs(filtered, "doc_id", "text", "source", dfCap = 20)
        .filter(col("inter") * 2 >= col("uni")).count()
    }

    // q41 stages
    time("q41:signatures") {
      Dedup.simhashSignatures(docs, "doc_id", "text",
                              keepCols = Seq("source"), bits = 32).count()
    }
    time("q41:full") {
      val sig = Dedup.simhashSignatures(docs, "doc_id", "text",
          keepCols = Seq("source"), bits = 32)
        .withColumnRenamed("simhash", "sh")
      Dedup.simhashPairs(sig, "doc_id", "sh", "source", bits = 32, maxHamming = 3).count()
    }
    spark.stop()
  }
}
