package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ingest.Pdf
import graft.search.Search

/** End-to-end driver program (cli/main.py + api/routes/documents.py
  * contract): ingest a directory → ledgered store → status → search,
  * with the run-log observation metrics matching a recomputation
  * (utils/metrics.py parity — task: observe rides the write, a groupBy
  * over the store must agree).
  */
class E2eMainSpec extends SparkSpec {
  import spark.implicits._

  private val now = Timestamp.valueOf("2025-06-01 12:00:00")

  private def fixtureDirs(): (String, String) = {
    val in = Files.createTempDirectory("graft_e2e_in").toFile
    val store = Files.createTempDirectory("graft_e2e_store").toString
    def put(name: String, bytes: Array[Byte]): Unit = {
      val f = new java.io.File(in, name)
      Files.write(f.toPath, bytes)
    }
    put("alpha.md", "# Spark\nspark query engine performance tuning guide".getBytes("UTF-8"))
    // same text under another name: a near-dup cluster of two; keep-one
    // must retain exactly one and mark the other 'duplicate'
    put("alpha_copy.txt",
        "# Spark\nspark query engine performance tuning guide".getBytes("UTF-8"))
    put("beta.txt", "completely unrelated cooking recipe with butter and flour".getBytes("UTF-8"))
    put("gamma.pdf", Pdf.minimalPdf("distributed shuffle partitioning strategies for spark"))
    put("bad.xyz", "no extractor for this extension".getBytes("UTF-8"))
    put("delta.docx",
        graft.ingest.Office.docxBytes("broadcast joins and shuffle partitions in spark"))
    put("photo.png", graft.multimodal.Codecs.pngSolid(8, 8, 0x336699))
    (in.toString, store)
  }

  test("ingest → ledger → status → search, metrics agree with recomputation") {
    val (in, store) = fixtureDirs()
    val report = Main.runIngest(spark, in, store, "nomic", now)

    // 7 files in, 1 quarantined (unknown ext); pdf + docx + md + txt +
    // png (real image decode) convert
    assert(report.nDocs === 7)
    assert(report.nFailed === 1)
    assert(report.nChunks > 0 && report.nEmbedded === report.nChunks)

    val docs = spark.read.parquet(s"$store/documents.parquet")
    val byName = docs.select($"filename", $"status", $"error_message")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(byName("bad.xyz") === (("failed", "File format not allowed")))
    assert(byName("gamma.pdf")._1 !== "failed", "simple PDF must convert")
    assert(byName("delta.docx")._1 !== "failed", "simple DOCX must convert")
    assert(byName("photo.png")._1 !== "failed", "image must real-decode, not quarantine")

    // keep-one dedup: the alpha pair (identical text, two filenames —
    // note .txt rewrites to .md) collapses to one kept doc + one
    // 'duplicate' pointing at it; the duplicate is never chunked.
    val alphaPair = docs
      .filter($"filename".isin("alpha.md", "alpha_copy.md"))
      .select($"doc_id", $"status", $"metadata_json")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(alphaPair.length === 2)
    val dups = alphaPair.filter(_._2 == "duplicate")
    val kept = alphaPair.filterNot(_._2 == "duplicate")
    assert(dups.length === 1 && kept.length === 1,
           s"expected one kept + one duplicate, got $alphaPair")
    // the commit lands the reference's post-processing transition:
    // the kept converted doc is COMPLETED, not parked at pending
    // (services/document_processor.py:117-120)
    assert(kept.head._2 === "completed", alphaPair.toString)
    assert(dups.head._3 === s"""{"duplicate_of":"${kept.head._1}"}""")
    val dupChunks = spark.read.parquet(s"$store/chunks.parquet")
      .filter($"doc_id" === dups.head._1).count()
    assert(dupChunks === 0, "duplicate doc must not be chunked")

    // ledger: every doc's job reached a terminal state; failed doc failed
    val jobs = spark.read.parquet(s"$store/jobs.parquet")
    val finalStates = graft.io.Tables
      .latestByKey(jobs, Seq("job_id"), Seq($"updated_at"))
      .select($"job_id", $"status").as[(String, String)].collect().toMap
    assert(finalStates.size === 7)
    assert(finalStates.values.count(_ == "failed") === 1)
    assert(finalStates.values.count(_ == "completed") === 6)

    // status command shape: job + doc rows for a known doc id
    val someDoc = docs.filter($"filename" === "alpha.md")
      .select($"doc_id").as[String].head()
    val statusLines = Main.runStatus(spark, store, someDoc)
    assert(statusLines.exists(_.contains("\"status\":\"completed\"")))
    assert(statusLines.exists(_.contains("\"doc_status\"")))

    // observation metrics must equal a recomputation over the store
    val chunks = spark.read.parquet(s"$store/chunks.parquet")
    val (nC, minL, maxL) = chunks
      .agg(count(lit(1)), min(length($"content")), max(length($"content")))
      .as[(Long, Int, Int)].head()
    assert(report.observed("n_chunks").toString.toLong === nC)
    assert(report.observed("min_len").toString.toInt === minL)
    assert(report.observed("max_len").toString.toInt === maxL)
    val nE = spark.read.parquet(s"$store/embeddings.parquet").count()
    assert(report.observed("n_embedded").toString.toLong === nE)

    // run-log persisted the same values
    val runlog = spark.read.parquet(s"$store/runlog.parquet")
      .select($"metric", $"value").as[(String, Double)].collect().toMap
    assert(runlog("n_chunks").toLong === nC)
    assert(runlog("n_embedded").toLong === nE)
    assert(runlog.contains("seconds") || runlog.keySet.exists(_.endsWith("seconds")) ||
           runlog.size >= 6) // latency rows present
    val lat = graft.metrics.Metrics.latencySummary(
        spark.read.parquet(s"$store/runlog.parquet"))
      .select($"stage", $"p50_s", $"max_s").collect()
    assert(lat.nonEmpty && lat.forall(r => r.getDouble(1) > 0 && r.getDouble(2) >= r.getDouble(1)))

    // search: the spark-ish query must rank a spark chunk above the recipe
    val hits = Main.runSearch(spark, store, "spark query engine performance", "nomic", 3)
    assert(hits.nonEmpty)
    assert(hits.head.contains("spark"), s"top hit should be spark content: ${hits.head}")

    // profile: per-strategy length quantiles over the stored chunks —
    // n_docs must equal the chunk counts, and the p50 bound must agree
    // with a brute-force log2 quantile over the same contents
    val profLines = Main.runProfile(spark, store)
    assert(profLines.nonEmpty)
    val lens = chunks.select($"strategy", length($"content").cast("long"))
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // quantile lines carry p50_lb; the report also appends register
    // (est_distinct) and probe lines, which this loop must not misread
    for (line <- profLines if line.contains("\"p50_lb\":");
         strat <- lens.keys if line.contains(s""""strategy":"$strat"""")) {
      assert(line.contains(s""""n_docs":${lens(strat).size}"""), line)
      val sorted = lens(strat).map(v => 64 - java.lang.Long.numberOfLeadingZeros(math.max(v, 1L))).sorted
      val p50bin = sorted((sorted.size * 50 + 99) / 100 - 1)
      assert(line.contains(s""""p50_lb":${1L << (p50bin - 1)}"""), s"$line vs bin $p50bin")
    }
    // the corpus-health line carries the exact Zipf rational with
    // a meaningful (nonzero-denominator) fit over real chunk text
    val zipfLine = profLines.find(_.contains("\"zipf_n_terms\":"))
      .getOrElse(fail(profLines.mkString("\n")))
    assert(zipfLine.contains("\"zipf_n_terms\":"), zipfLine)
    val zden = """"zipf_slope_den":(-?\d+)""".r.findFirstMatchIn(zipfLine)
      .map(_.group(1).toLong).getOrElse(fail(zipfLine))
    assert(zden > 0, zipfLine)

    // idempotent re-ingest: upsert keeps key cardinality stable
    Main.runIngest(spark, in, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(10)))
    assert(spark.read.parquet(s"$store/documents.parquet").count() === 7)
    assert(spark.read.parquet(s"$store/chunks.parquet").count() === nC)
    assert(spark.read.parquet(s"$store/embeddings.parquet").count() === nE)
    // and the cache-aside actually HIT: no embedding was recomputed, so
    // every stored row still carries the FIRST run's timestamp
    val stamps = spark.read.parquet(s"$store/embeddings.parquet")
      .select($"created_at").distinct().as[Timestamp].collect().toSeq
    assert(stamps === Seq(now), s"re-ingest must reuse cached embeddings, got $stamps")

    // crash recovery: leftovers from a commit that died mid-swap (stale
    // .tmp and .trash snapshots) must not corrupt the next commit — the
    // table swap cleans them and lands the new snapshot atomically
    for (leftover <- Seq("documents.parquet.tmp", "documents.parquet.trash")) {
      val d = new java.io.File(store, leftover)
      d.mkdirs()
      Files.writeString(new java.io.File(d, "junk").toPath, "stale")
    }
    Main.runIngest(spark, in, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(20)))
    assert(spark.read.parquet(s"$store/documents.parquet").count() === 7)
    assert(!new java.io.File(store, "documents.parquet.tmp").exists())
    assert(!new java.io.File(store, "documents.parquet.trash").exists())

    // crash BETWEEN the two swap renames: the live dir is gone and the
    // old snapshot sits in .trash — the only complete copy. The next
    // commit must RESTORE it (not delete it) and then land normally.
    val live = new java.io.File(store, "documents.parquet")
    val aside = new java.io.File(store, "documents.parquet.trash")
    assert(live.renameTo(aside))
    Main.runIngest(spark, in, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(30)))
    assert(spark.read.parquet(s"$store/documents.parquet").count() === 7,
           "post-crash commit must merge against the restored snapshot")
    assert(!aside.exists())
  }

  test("Q4 e2e: repeat search hits the cache; a store update invalidates its provider's keys") {
    val in = Files.createTempDirectory("graft_q4_in").toFile
    val store = Files.createTempDirectory("graft_q4_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("one.md", "spark query engine performance and shuffle tuning")
    put("two.md", "unrelated cooking recipe with butter and flour")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    // embed with granite too: the provider-scoped invalidation scenario
    // needs BOTH providers' results cacheable (a provider with no
    // stored embeddings returns empty, and an empty result has no rows
    // to cache — by design, like the reference's empty ES hit list)
    Main.runIngest(spark, in.toString, store, "granite",
                   Timestamp.from(now.toInstant.plusMillis(1)))

    val q = "spark query engine performance"
    val (r1, h1) = Main.runSearchCached(spark, store, q, "nomic", 3)
    assert(!h1 && r1.nonEmpty, "first search is a miss that computes")
    val (r2, h2) = Main.runSearchCached(spark, store, q, "nomic", 3)
    assert(h2, "repeat search must hit the cache")
    assert(r2 == r1, "hit must serve the cached rows verbatim")
    // a second provider caches independently
    val (_, gh1) = Main.runSearchCached(spark, store, q, "granite", 3)
    assert(!gh1)
    val (gr2, gh2) = Main.runSearchCached(spark, store, q, "granite", 3)
    assert(gh2)

    // store UPDATE (new doc, nomic embeddings change) → nomic keys
    // invalidated; granite results still rank only granite's unchanged
    // embeddings and survive
    put("three.md", "another spark performance document about query planning")
    Main.runIngest(spark, in.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(10)))
    val cached = spark.read.parquet(s"$store/search_cache.parquet")
      .select($"embedding_provider").distinct().as[String].collect().toSet
    assert(cached == Set("granite"),
           s"nomic keys must be invalidated, granite kept: $cached")
    val (r3, h3) = Main.runSearchCached(spark, store, q, "nomic", 3)
    assert(!h3, "post-ingest search must recompute")
    assert(r3.nonEmpty)
    val (gr3, gh3) = Main.runSearchCached(spark, store, q, "granite", 3)
    assert(gh3 && gr3 == gr2, "granite cache must survive a nomic ingest")
  }

  test("a later ingest demoting a doc to duplicate prunes its chunks and embeddings") {
    import graft.ingest.Ingest
    val in = Files.createTempDirectory("graft_demote_in").toFile
    val store = Files.createTempDirectory("graft_demote_store").toString
    val content = "spark query engine performance tuning guide for training pipelines"
    // doc ids are sha256(base64(content) + filename); compute them with
    // the real ingest projection to pick the filename that WINS
    // keep-one (equal text length → min doc id keeps)
    val candidates = (0 to 9).map(i => s"v$i.md")
    val ids = Ingest.toDocuments(
        candidates.map(n => (s"/x/$n", content.getBytes("UTF-8"))).toDF("path", "content"),
        lit(now))
      .select($"filename", $"doc_id").as[(String, String)].collect().toMap
    val loser = candidates.maxBy(ids)
    val winner = candidates.minBy(ids)
    def put(name: String): Unit =
      Files.write(new java.io.File(in, name).toPath, content.getBytes("UTF-8"))

    put(loser)
    Main.runIngest(spark, in.toString, store, "nomic", now)
    assert(spark.read.parquet(s"$store/chunks.parquet")
      .filter($"doc_id" === ids(loser)).count() > 0)

    put(winner)
    Main.runIngest(spark, in.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(5)))
    val status = spark.read.parquet(s"$store/documents.parquet")
      .select($"doc_id", $"status").as[(String, String)].collect().toMap
    assert(status(ids(loser)) === "duplicate")
    assert(status(ids(winner)) !== "duplicate")
    // the demoted doc's run-1 chunks and embeddings are gone from the store
    val chunks = spark.read.parquet(s"$store/chunks.parquet")
    assert(chunks.filter($"doc_id" === ids(loser)).count() === 0,
           "stale chunks of a demoted doc must be pruned")
    assert(chunks.filter($"doc_id" === ids(winner)).count() > 0)
    assert(spark.read.parquet(s"$store/embeddings.parquet")
      .filter($"chunk_id".startsWith(ids(loser))).count() === 0,
           "stale embeddings of a demoted doc must be pruned")
  }

  test("profile state: state-served report ≡ rescan across batches and re-delivery; demotion keeps additive lines exact; rebuild resets the register history") {
    val in1 = Files.createTempDirectory("graft_prof_in1").toFile
    val in2 = Files.createTempDirectory("graft_prof_in2").toFile
    val in3 = Files.createTempDirectory("graft_prof_in3").toFile
    val store = Files.createTempDirectory("graft_prof_store").toString
    def put(dir: java.io.File, name: String, text: String): Unit =
      Files.write(new java.io.File(dir, name).toPath, text.getBytes("UTF-8"))
    // the stored doc carries a UNIQUE token (zebra) its future near-dup
    // replacement lacks — the register line's one-sidedness needs a
    // demotion that actually removes vocabulary from the live store
    val base = "spark query engine zebra performance tuning guide for " +
      "training pipelines with shuffle partitioning and broadcast joins"
    put(in1, "a.md", base)
    put(in1, "b.txt", "watermark lateness checkpoint recovery for streaming")
    put(in2, "c.md", "vector index probes and cell balancing maintenance notes")
    // near-dup of a.md: zebra substituted + a longer tail, so it WINS
    // keep-one (length score) and demotes the stored original
    put(in3, "a2.md", base.replace("zebra", "alpaca") +
      " plus watermark checkpoints and recovery drills at scale")

    def served(tokens: Seq[String] = Nil) =
      Main.runProfile(spark, store, probeTokens = tokens)
    def rescan(tokens: Seq[String] = Nil) =
      Main.runProfile(spark, store, rebuild = true, probeTokens = tokens)

    // batch 1: the artifact exists, is in sync, and serves ≡ rescan
    Main.runIngest(spark, in1.toString, store, "nomic", now)
    assert(new java.io.File(store, "profile_state.parquet/_sync").isFile,
      "ingest must commit the profile-state artifact")
    val s1 = served()
    assert(s1 === rescan(), "state-served profile must equal a rescan")

    // batch 2 folds the delta; re-delivery of batch 1 is a no-op fold
    // (stale subtraction cancels the re-added rows; registers are
    // max-idempotent) — both stay ≡ rescan
    Main.runIngest(spark, in2.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(5)))
    assert(served() === rescan(), "fold across batches must equal a rescan")
    Main.runIngest(spark, in1.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(10)))
    assert(served() === rescan(), "re-delivered batch must fold to a no-op")

    // CMS probes: state-served ≡ rescan, and the estimate is one-sided
    // (≥ the true count; an absent token may still hit occupied buckets)
    val probes = Seq("spark", "zebra", "zzzabsent")
    val sp = served(probes)
    assert(sp === rescan(probes))
    val trueSpark = spark.read.parquet(s"$store/chunks.parquet")
      .select(explode(split(lower($"content"), "\\W+")).as("t"))
      .filter($"t" === "spark").count()
    def est(lines: Seq[String], tok: String): Long =
      lines.collectFirst {
        case l if l.contains(s""""token":"$tok"""") =>
          s""""est_cnt":(\\d+)""".r.findFirstMatchIn(l).get.group(1).toLong
      }.getOrElse(fail(s"no probe line for $tok in\n${lines.mkString("\n")}"))
    assert(est(sp, "spark") >= trueSpark && trueSpark > 0)
    assert(est(sp, "zebra") >= 1L)

    // batch 3 DEMOTES the stored a.md (longer near-dup wins keep-one):
    // the additive report lines — quantiles, zipf, CMS probes — still
    // subtract exactly, and the demotion touching ≤ MaxExactShards
    // register shards means the register line is now EXACT too (the
    // touched shards rebuilt from the committed table's survivors) —
    // the WHOLE report serves ≡ rescan bit-for-bit. The monotone
    // carve-out survives only for wide demotions (next test).
    Main.runIngest(spark, in3.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(15)))
    val aId = spark.read.parquet(s"$store/documents.parquet")
      .filter($"filename" === "a.md").select($"status").as[String].head()
    assert(aId === "duplicate", "fixture must actually demote the stored doc")
    val sv = served(probes)
    val rs = rescan(probes) // NOTE: also rebuilds the state from the live store
    assert(sv === rs,
      "a small-demotion ingest's profile — register line included — " +
        "must serve ≡ rescan bit-for-bit")
    assert(est(sv, "zebra") === est(rs, "zebra"))
    // the scan bound rode the runlog: the exact rebuild re-tokenized
    // only the touched shards' surviving rows, strictly under the table
    val bound = spark.read.parquet(s"$store/runlog.parquet")
      .filter($"metric" === "n_chunks_rescanned_for_regs")
      .orderBy($"run_at".desc).select($"value").as[Double].head()
    assert(bound < spark.read.parquet(s"$store/chunks.parquet").count().toDouble,
      "the register rebuild must be shard-bounded, not a corpus rescan")
    assert(spark.read.parquet(s"$store/runlog.parquet")
      .filter($"metric" === "regs_monotone_after_demotion").count() === 0L,
      "the exact path must not claim the monotone carve-out")
    assert(served(probes) === rescan(probes))
  }

  test("ingest: a WIDE demotion batch keeps the history-monotone registers — and says so in the runlog") {
    import graft.text.ProfileState
    val in1 = Files.createTempDirectory("graft_wide_in1").toFile
    val in2 = Files.createTempDirectory("graft_wide_in2").toFile
    val store = Files.createTempDirectory("graft_wide_store").toString
    def put(dir: java.io.File, name: String, text: String): Unit =
      Files.write(new java.io.File(dir, name).toPath, text.getBytes("UTF-8"))
    // 24 stored docs, each with its own shingle space (no cross-pair
    // similarity), each later demoted by a longer near-dup — the
    // demoted set spans more register shards than the exactness gate
    val bases = (0 until 24).map(i =>
      (0 until 40).map(j => s"tok${i}x$j").mkString(" ") + s" zeb$i")
    bases.zipWithIndex.foreach { case (b, i) => put(in1, s"d$i.md", b) }
    // the near-dup tail is per-pair unique too: ANY token shared
    // across pairs risks cross-pair LSH collisions that merge the
    // clusters and break the one-demotion-per-pair fixture
    bases.zipWithIndex.foreach { case (b, i) =>
      put(in2, s"d${i}b.md", b.replace(s"zeb$i", s"alp$i") +
        s" extra${i}a extra${i}b extra${i}c extra${i}d extra${i}e") }
    Main.runIngest(spark, in1.toString, store, "nomic", now)
    Main.runIngest(spark, in2.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(5)))
    val demoted = spark.read.parquet(s"$store/documents.parquet")
      .filter($"status" === "duplicate").select($"doc_id").as[String]
      .collect().toSeq
    assert(demoted.size === 24, s"fixture must demote all stored docs: ${demoted.size}")
    assert(demoted.map(ProfileState.shardOf).distinct.size
             > ProfileState.MaxExactShards,
      "fixture must span more shards than the gate")
    // the runlog SAYS the registers stayed monotone…
    assert(spark.read.parquet(s"$store/runlog.parquet")
      .filter($"metric" === "regs_monotone_after_demotion").count() === 1L)
    // …and they do: additive lines ≡ rescan, registers upper-bound it
    val sv = Main.runProfile(spark, store)
    val rs = Main.runProfile(spark, store, rebuild = true)
    def splitLines(ls: Seq[String]) = ls.partition(_.contains("\"est_distinct\":"))
    val (svReg, svAdd) = splitLines(sv)
    val (rsReg, rsAdd) = splitLines(rs)
    assert(svAdd === rsAdd,
      "additive profile lines must survive a wide demotion bit-identically")
    def field(ls: Seq[String], name: String) = ls.map { l =>
      s""""$name":(\\d+)""".r.findFirstMatchIn(l).get.group(1).toLong
    }
    assert(field(svReg, "est_distinct").zip(field(rsReg, "est_distinct"))
             .forall { case (a, r) => a >= r },
      s"history registers must upper-bound the live store: $svReg vs $rsReg")
    assert(field(svReg, "registers_used").sum > field(rsReg, "registers_used").sum,
      "24 demoted unique markers must show as strict register history")
    // rebuild resets the history, as documented
    assert(Main.runProfile(spark, store) === rs)
  }

  test("delete: a takedown removes the doc from every serving tier, tombstones it, and blocks re-upload; a second delete fails loudly") {
    val in = Files.createTempDirectory("graft_del_in").toFile
    val store = Files.createTempDirectory("graft_del_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("target.md", "confidential zebra takedown spark query engine tuning")
    put("keep.md", "watermark lateness checkpoint recovery for streaming")
    put("keep2.md", "vector index probes and cell balancing maintenance notes")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    // the full serving surface: postings index + vector index — plus a
    // snapshot, which is immutable history the takedown must AUDIT
    Main.runBuildPostings(spark, store, 8)
    Main.runBuildVectorIndex(spark, store, "nomic", 2)
    graft.io.Snapshots.create(store, "pre")
    val id = spark.read.parquet(s"$store/documents.parquet")
      .filter($"filename" === "target.md").select($"doc_id").as[String].head()
    // pre-delete: every tier serves the doc
    assert(Main.runSearch(spark, store, "zebra takedown", "nomic", 3)
      .exists(_.contains("zebra")))
    assert(Main.runPhrase(spark, store, "zebra takedown").nonEmpty)

    val report = Main.runDelete(spark, store, id,
      Timestamp.from(now.toInstant.plusMillis(50)))
    assert(report.head.contains(s""""deleted":"$id""""), report.head)
    assert(report.head.contains("\"chunks_removed\":1"), report.head)
    // the snapshot carve-out is AUDITED, not silent: immutable history
    // still holds the doc, and the report names it for dropsnapshot
    assert(report.head.contains(""""snapshots_holding":["pre"]"""), report.head)

    // tombstone: status removed, content GONE, row still addressable
    val row = spark.read.parquet(s"$store/documents.parquet")
      .filter($"doc_id" === id)
      .select($"status", $"content_b64").collect()
    assert(row.length === 1)
    assert(row.head.getString(0) === "removed")
    assert(row.head.isNullAt(1), "takedown must null the stored content")
    val got = Main.runGet(spark, store, id)
    assert(got.head.contains("\"status\":\"removed\"") && got.length === 1,
      s"get must serve the tombstone with zero chunks: $got")

    // every serving tier: no chunks, embeddings, signatures, postings,
    // vector-index rows; search/phrase no longer surface it
    assert(spark.read.parquet(s"$store/chunks.parquet")
      .filter($"doc_id" === id).count() === 0)
    assert(spark.read.parquet(s"$store/embeddings.parquet")
      .filter($"chunk_id".startsWith(id)).count() === 0)
    assert(spark.read.parquet(s"$store/signatures.parquet")
      .filter($"doc" === id).count() === 0)
    assert(spark.read.parquet(s"$store/postings.idx")
      .filter($"chunk_id".startsWith(id)).count() === 0,
      "postings of a deleted doc must leave the index")
    assert(spark.read.parquet(graft.search.VectorIndex.indexPath(store))
      .filter($"chunk_id".startsWith(id)).count() === 0,
      "vector-index rows of a deleted doc must leave the index")
    assert(!Main.runSearch(spark, store, "zebra takedown", "nomic", 3)
      .exists(_.contains("zebra")))
    assert(Main.runPhrase(spark, store, "zebra takedown").isEmpty)
    // profile state folded the subtraction exactly: the additive lines
    // serve ≡ rescan; the register line is history-monotone (a delete
    // is a demotion-class event — see the profile-state test), and
    // the rebuild resets it, after which served ≡ rescan entirely
    val (svReg0, svAdd0) = Main.runProfile(spark, store)
      .partition(_.contains("\"est_distinct\":"))
    val (rsReg0, rsAdd0) = Main.runProfile(spark, store, rebuild = true)
      .partition(_.contains("\"est_distinct\":"))
    assert(svAdd0 === rsAdd0)
    assert(svReg0.size === rsReg0.size)
    assert(Main.runProfile(spark, store) ===
           Main.runProfile(spark, store, rebuild = true))
    // the store audits clean after the takedown
    val (fsckLines, nViol) = Main.runFsck(spark, store)
    assert(nViol === 0L, fsckLines.mkString("\n"))

    // a second delete fails loudly
    val e = intercept[IllegalArgumentException] {
      Main.runDelete(spark, store, id,
        Timestamp.from(now.toInstant.plusMillis(60)))
    }
    assert(e.getMessage.contains("already removed"))
    // and an unknown id fails loudly too
    intercept[IllegalArgumentException] {
      Main.runDelete(spark, store, "no-such-doc",
        Timestamp.from(now.toInstant.plusMillis(60)))
    }

    // resurrection blocked: re-uploading the same file is dropped by
    // the tombstone gate — status stays removed, no chunks come back,
    // and the drop is counted in the run log
    Main.runIngest(spark, in.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(100)))
    val after = spark.read.parquet(s"$store/documents.parquet")
      .filter($"doc_id" === id).select($"status").as[String].collect()
    assert(after.toSeq === Seq("removed"),
      "a re-upload must not resurrect a taken-down doc")
    assert(spark.read.parquet(s"$store/chunks.parquet")
      .filter($"doc_id" === id).count() === 0)
    val tombLog = spark.read.parquet(s"$store/runlog.parquet")
      .filter($"metric" === "n_tombstoned").select($"value")
      .as[Double].collect()
    assert(tombLog.contains(1.0), s"run log must count the blocked upload: ${tombLog.toSeq}")

    // the tombstone wins the documents upsert even at a TIMESTAMP TIE
    // with the stored row (same-millisecond delete-after-ingest): the
    // commit stamps strictly after the stored updated_at, so the
    // latest-per-key window can never discard the takedown
    val keepId = spark.read.parquet(s"$store/documents.parquet")
      .filter($"filename" === "keep.md").select($"doc_id").as[String].head()
    Main.runDelete(spark, store, keepId, now) // == the ingest stamp
    val keepRow = spark.read.parquet(s"$store/documents.parquet")
      .filter($"doc_id" === keepId)
      .select($"status", $"content_b64").collect()
    assert(keepRow.length === 1 && keepRow.head.getString(0) === "removed" &&
           keepRow.head.isNullAt(1),
      "a timestamp-tied delete must still win the upsert")
  }

  test("batch delete: one transaction over an id set leaves every tier clean with ONE runlog entry; a bad id fails the whole batch pre-commit") {
    val in = Files.createTempDirectory("graft_bdel_in").toFile
    val store = Files.createTempDirectory("graft_bdel_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("d1.md", "alpha takedown subject one zebra spark engine tuning text")
    put("d2.md", "beta takedown subject two watermark checkpoint recovery notes")
    put("d3.md", "gamma takedown subject three vector probes and cell balancing")
    put("keep.md", "survivor document about cooking pasta with butter and flour")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    Main.runBuildPostings(spark, store, 8)
    Main.runBuildVectorIndex(spark, store, "nomic", 2)
    val byName = spark.read.parquet(s"$store/documents.parquet")
      .select($"filename", $"doc_id").as[(String, String)].collect().toMap
    val ids = Seq(byName("d1.md"), byName("d2.md"), byName("d3.md"))

    // BATCH CONTRACT: an unknown id anywhere fails the whole set
    // loudly BEFORE any mutation — nothing is half-deleted
    intercept[IllegalArgumentException] {
      Main.runDelete(spark, store, ids :+ "no-such-doc",
                     Timestamp.from(now.toInstant.plusMillis(40)),
                     purgeSnapshots = false)
    }
    assert(spark.read.parquet(s"$store/documents.parquet")
      .filter($"status" === "removed").count() === 0,
      "a failed batch must not have removed anything")

    val report = Main.runDelete(spark, store, ids,
                                Timestamp.from(now.toInstant.plusMillis(50)),
                                purgeSnapshots = false)
    assert(report.size === 3, report.mkString("\n"))
    ids.foreach(id =>
      assert(report.exists(_.contains(s""""deleted":"$id"""")), report.mkString("\n")))
    // every serving tier clean for every id, survivor untouched
    val chunks = spark.read.parquet(s"$store/chunks.parquet")
    val embs = spark.read.parquet(s"$store/embeddings.parquet")
    val sigs = spark.read.parquet(s"$store/signatures.parquet")
    val posts = spark.read.parquet(s"$store/postings.idx")
    val vec = spark.read.parquet(graft.search.VectorIndex.indexPath(store))
    ids.foreach { id =>
      assert(chunks.filter($"doc_id" === id).count() === 0, s"chunks of $id")
      assert(embs.filter($"chunk_id".startsWith(id)).count() === 0, s"embs of $id")
      assert(sigs.filter($"doc" === id).count() === 0, s"sigs of $id")
      assert(posts.filter($"chunk_id".startsWith(id)).count() === 0, s"postings of $id")
      assert(vec.filter($"chunk_id".startsWith(id)).count() === 0, s"vec rows of $id")
    }
    val keepId = byName("keep.md")
    assert(chunks.filter($"doc_id" === keepId).count() > 0, "survivor keeps its chunks")
    assert(Main.runSearch(spark, store, "cooking pasta", "nomic", 3)
      .exists(_.contains("pasta")), "survivor still serves")
    // ONE runlog entry for the whole batch — the set-valued transaction
    // ran the stage order once, not once per id
    val delLog = spark.read.parquet(s"$store/runlog.parquet")
      .filter($"stage" === "delete" && $"metric" === "n_docs_deleted")
      .select($"value").as[Double].collect().toSeq
    assert(delLog === Seq(3.0), s"one batch entry expected: $delLog")
    // per-doc report counts sum to the aggregate the runlog recorded
    val chunksRemoved = spark.read.parquet(s"$store/runlog.parquet")
      .filter($"stage" === "delete" && $"metric" === "n_chunks_removed")
      .select($"value").as[Double].head()
    val perDocSum = report.flatMap(
      """"chunks_removed":(\d+)""".r.findFirstMatchIn(_)).map(_.group(1).toLong).sum
    assert(perDocSum.toDouble === chunksRemoved, s"$perDocSum vs $chunksRemoved")
    // the store audits clean after the batch takedown
    val (fsckLines, nViol) = Main.runFsck(spark, store)
    assert(nViol === 0L, fsckLines.mkString("\n"))
    // re-upload of any batch member is tombstone-blocked
    Main.runIngest(spark, in.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(100)))
    ids.foreach(id =>
      assert(spark.read.parquet(s"$store/chunks.parquet")
        .filter($"doc_id" === id).count() === 0, s"resurrection of $id"))
  }

  test("batch delete ≡ the same ids deleted one by one: identical final store, ONE commit instead of k") {
    val in = Files.createTempDirectory("graft_beq_in").toFile
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    (0 until 6).foreach(i =>
      put(s"doc$i.md", (0 until 30).map(j => s"v${i}_$j").mkString(" ")))
    def mkStore(): String = {
      val s = Files.createTempDirectory("graft_beq_store").toString
      Main.runIngest(spark, in.toString, s, "nomic", now)
      Main.runBuildPostings(spark, s, 8)
      s
    }
    val (sA, sB) = (mkStore(), mkStore())
    val ids = spark.read.parquet(s"$sA/documents.parquet")
      .select($"doc_id").as[String].collect().toSeq.sorted.take(3)
    val delAt = Timestamp.from(now.toInstant.plusMillis(50))
    Main.runDelete(spark, sA, ids, delAt, purgeSnapshots = false)
    ids.foreach(id => Main.runDelete(spark, sB, id, delAt))
    // every table's CONTENT identical — the set-valued transaction is
    // the sequential composition, fused into one commit per table
    // (per-shard register independence makes even the profile state
    // order-free: a shard rebuilds only from ITS surviving docs)
    def rows(store: String, table: String, cols: Seq[String]): Seq[String] =
      spark.read.parquet(s"$store/$table")
        .select(cols.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    for ((t, cs) <- Seq(
      "documents.parquet" -> Seq("doc_id", "status", "content_b64", "updated_at"),
      "chunks.parquet" -> Seq("chunk_id", "content"),
      "embeddings.parquet" -> Seq("chunk_id", "embedding_provider"),
      "signatures.parquet" -> Seq("doc", "band", "sig"),
      "postings.idx" -> Seq("chunk_id")))
      assert(rows(sA, t, cs) === rows(sB, t, cs), s"$t diverged")
    assert(Main.runProfile(spark, sA) === Main.runProfile(spark, sB),
      "the profile artifact must serve identically under either path")
    // ...but the batch paid ONE transaction, the singles paid k
    def nDeleteCommits(s: String): Long =
      spark.read.parquet(s"$s/runlog.parquet")
        .filter($"metric" === "n_docs_deleted").count()
    assert(nDeleteCommits(sA) === 1L && nDeleteCommits(sB) === 3L)
  }

  test("delete --purge-snapshots: erasure completes in one command (rollback cannot resurrect); a failed drop is loud while the committed delete stands") {
    val in = Files.createTempDirectory("graft_purge_in").toFile
    val store = Files.createTempDirectory("graft_purge_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("target.md", "confidential zebra purge subject spark engine text")
    put("keep.md", "watermark lateness checkpoint recovery for streaming")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    graft.io.Snapshots.create(store, "s1")
    graft.io.Snapshots.create(store, "s2")
    // s2's documents table becomes UNREADABLE — REPLACED, never written
    // in place (the files are hardlinks shared with the live store):
    // the audit must treat it as conservatively holding, and the purge
    // must still complete the erasure
    val s2docs = new java.io.File(s"$store/.snapshots/s2/documents.parquet")
    graft.io.Tables.rmTree(s2docs)
    Files.write(s2docs.toPath, "garbage, not parquet".getBytes("UTF-8"))
    val id = spark.read.parquet(s"$store/documents.parquet")
      .filter($"filename" === "target.md").select($"doc_id").as[String].head()

    val report = Main.runDelete(spark, store, Seq(id),
                                Timestamp.from(now.toInstant.plusMillis(50)),
                                purgeSnapshots = true)
    assert(report.head.contains(""""snapshots_holding":[]"""), report.head)
    assert(report.last.contains(""""snapshots_purged":["s1","s2"]"""), report.last)
    // the damaged-backup tradeoff is itemized: s2 was dropped because
    // it could not be audited, NOT because it provably held the id —
    // the summary names it apart so the operator knows which purged
    // history was destroyed as a side effect
    assert(report.last.contains(""""purged_for_unreadability":["s2"]"""),
      report.last)
    assert(graft.io.Snapshots.list(store).isEmpty,
      "both holding snapshots must be gone")
    // a rollback to the purged history is impossible — erasure complete
    intercept[IllegalArgumentException] {
      graft.io.Snapshots.restore(store, "s1")
    }
    assert(spark.read.parquet(s"$store/documents.parquet")
      .filter($"doc_id" === id).select($"status").as[String].head() === "removed")

    // a drop that FAILS mid-purge: loud, names the survivor, and the
    // committed delete stands (retry = dropsnapshot by hand)
    val store2 = Files.createTempDirectory("graft_purge_store2").toString
    Main.runIngest(spark, in.toString, store2, "nomic", now)
    graft.io.Snapshots.create(store2, "p1")
    val id2 = spark.read.parquet(s"$store2/documents.parquet")
      .filter($"filename" === "target.md").select($"doc_id").as[String].head()
    graft.io.Faults.arm("snapshot.drop.before-rm")
    val e = intercept[IllegalStateException] {
      Main.runDelete(spark, store2, Seq(id2),
                     Timestamp.from(now.toInstant.plusMillis(60)),
                     purgeSnapshots = true)
    }
    graft.io.Faults.reset()
    assert(e.getMessage.contains("COMMITTED") && e.getMessage.contains("p1"),
      e.getMessage)
    assert(spark.read.parquet(s"$store2/documents.parquet")
      .filter($"doc_id" === id2).select($"status").as[String].head() === "removed",
      "the base delete must stand behind a failed purge")
    // the documented retry completes the erasure
    graft.io.Snapshots.drop(store2, "p1")
    assert(graft.io.Snapshots.list(store2).isEmpty)

    // a MISTYPED flag fails loudly BEFORE anything runs: a silently
    // ignored --purge-snapshot (no 's') would commit the takedown
    // without the requested purge — a partial compliance action
    val e2 = intercept[IllegalArgumentException] {
      Main.main(Array("delete", store2, "someid", "--purge-snapshot"))
    }
    assert(e2.getMessage.contains("unknown delete flag"), e2.getMessage)
  }

  test("delete without snapshot flags: an unreadable snapshot is reported on its own summary line, never silently merged into holding") {
    val in = Files.createTempDirectory("graft_unrd_in").toFile
    val store = Files.createTempDirectory("graft_unrd_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("target.md", "confidential okapi audit subject spark engine text")
    put("keep.md", "watermark lateness checkpoint recovery for streaming")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    graft.io.Snapshots.create(store, "good")
    graft.io.Snapshots.create(store, "bad")
    val badDocs = new java.io.File(s"$store/.snapshots/bad/documents.parquet")
    graft.io.Tables.rmTree(badDocs)
    Files.write(badDocs.toPath, "garbage, not parquet".getBytes("UTF-8"))
    val id = spark.read.parquet(s"$store/documents.parquet")
      .filter($"filename" === "target.md").select($"doc_id").as[String].head()
    val report = Main.runDelete(spark, store, id,
      Timestamp.from(now.toInstant.plusMillis(50)))
    // the readable snapshot audits as holding; the unreadable one is a
    // DISTINCT verdict with its own line — an operator can tell "this
    // snapshot holds the doc" from "this snapshot cannot be audited"
    assert(report.head.contains(""""snapshots_holding":["good"]"""), report.head)
    assert(report.last === """{"snapshots_unreadable":["bad"]}""", report.last)
    // both snapshots survive a flag-less delete untouched
    assert(graft.io.Snapshots.list(store) === Seq("bad", "good"))
  }

  test("delete --scrub-snapshots: surgical erasure — other docs' time travel survives row-for-row, rollback cannot resurrect, unreadable snapshots are refused") {
    val in = Files.createTempDirectory("graft_scrub_in").toFile
    val store = Files.createTempDirectory("graft_scrub_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("target.md", "confidential quagga scrub subject spark engine text")
    put("keep.md", "watermark lateness checkpoint recovery for streaming")
    put("keep2.md", "vector index probes and cell balancing maintenance notes")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    Main.runBuildPostings(spark, store, 8)
    graft.io.Snapshots.create(store, "s1")
    val snapRoot = s"$store/.snapshots/s1"
    val id = spark.read.parquet(s"$store/documents.parquet")
      .filter($"filename" === "target.md").select($"doc_id").as[String].head()
    // pre-scrub snapshot rows for the OTHER docs: the row-for-row
    // survival contract compares these exact rows after the scrub
    def others(table: String, docOf: org.apache.spark.sql.Column): Seq[String] =
      spark.read.parquet(s"$snapRoot/$table")
        .filter(docOf =!= id)
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    val tables = Seq(
      "documents.parquet" -> col("doc_id"),
      "chunks.parquet" -> col("doc_id"),
      "embeddings.parquet" -> substring(col("chunk_id"), 1, 64),
      "signatures.parquet" -> col("doc"),
      "postings.idx" -> substring(col("chunk_id"), 1, 64))
    val before = tables.map { case (t, c) => t -> others(t, c) }.toMap

    val report = Main.runDelete(spark, store, Seq(id),
      Timestamp.from(now.toInstant.plusMillis(50)),
      purgeSnapshots = false, scrubSnapshots = true)
    assert(report.head.contains(""""snapshots_holding":[]"""), report.head)
    assert(report.last.contains(""""snapshots_scrubbed":["s1"]"""), report.last)
    // the snapshot SURVIVES — surgical, not wholesale
    assert(graft.io.Snapshots.list(store) === Seq("s1"))
    // every other doc's history serves identically, row for row
    tables.foreach { case (t, c) =>
      assert(others(t, c) === before(t), s"$t: other docs' rows must survive") }
    // the scrubbed id inside the snapshot: tombstoned docs row, every
    // serving tier empty
    val snapRow = spark.read.parquet(s"$snapRoot/documents.parquet")
      .filter($"doc_id" === id).select($"status", $"content_b64").collect()
    assert(snapRow.length === 1 && snapRow.head.getString(0) === "removed")
    assert(snapRow.head.isNullAt(1), "snapshot content must be nulled")
    Seq("chunks.parquet" -> (col("doc_id") === id),
        "embeddings.parquet" -> col("chunk_id").startsWith(id),
        "signatures.parquet" -> (col("doc") === id),
        "postings.idx" -> col("chunk_id").startsWith(id)).foreach {
      case (t, pred) =>
        assert(spark.read.parquet(s"$snapRoot/$t").filter(pred).count() === 0L,
          s"$t must not hold the scrubbed id") }
    // byte-level absence: the unique token appears in NO file under the
    // snapshot (or the live store) after the scrub
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    def bytesHold(root: String, needle: String): Boolean =
      walk(new java.io.File(root)).exists { f =>
        // latin-1 is byte-transparent: every byte maps to one char, so
        // a UTF-8 ascii needle greps raw bytes exactly
        new String(java.nio.file.Files.readAllBytes(f.toPath), "ISO-8859-1")
          .contains(needle)
      }
    assert(!bytesHold(snapRoot, "quagga"), "snapshot bytes must be scrubbed")
    assert(!bytesHold(store, "quagga"), "live bytes must be scrubbed")
    // rollback to the scrubbed snapshot CANNOT resurrect: the
    // tombstone rolls back with it, so content stays gone and the
    // ingest gate still blocks a re-upload
    graft.io.Snapshots.restore(store, "s1")
    val liveRow = spark.read.parquet(s"$store/documents.parquet")
      .filter($"doc_id" === id).select($"status", $"content_b64").collect()
    assert(liveRow.head.getString(0) === "removed" && liveRow.head.isNullAt(1),
      "rollback must not resurrect the scrubbed doc")
    Main.runIngest(spark, in.toString, store, "nomic",
      Timestamp.from(now.toInstant.plusMillis(100)))
    assert(spark.read.parquet(s"$store/documents.parquet")
      .filter($"doc_id" === id).select($"status").as[String].head() === "removed",
      "re-upload must stay blocked after rollback")
    val (_, nViol) = Main.runFsck(spark, store)
    assert(nViol === 0L)
    // other docs still serve from the rolled-back store
    assert(Main.runSearch(spark, store, "watermark lateness", "nomic", 3)
      .exists(_.contains("watermark")))

    // an UNREADABLE snapshot is REFUSED by scrub (purge is the
    // documented wholesale path): loud, names it, the delete stands
    val store2 = Files.createTempDirectory("graft_scrub_store2").toString
    Main.runIngest(spark, in.toString, store2, "nomic", now)
    graft.io.Snapshots.create(store2, "u1")
    val u1docs = new java.io.File(s"$store2/.snapshots/u1/documents.parquet")
    graft.io.Tables.rmTree(u1docs)
    Files.write(u1docs.toPath, "garbage, not parquet".getBytes("UTF-8"))
    val id2 = spark.read.parquet(s"$store2/documents.parquet")
      .filter($"filename" === "target.md").select($"doc_id").as[String].head()
    val e = intercept[IllegalStateException] {
      Main.runDelete(spark, store2, Seq(id2),
        Timestamp.from(now.toInstant.plusMillis(50)),
        purgeSnapshots = false, scrubSnapshots = true)
    }
    assert(e.getMessage.contains("UNREADABLE") && e.getMessage.contains("u1"),
      e.getMessage)
    assert(new java.io.File(s"$store2/.snapshots/u1").isDirectory,
      "scrub must never destroy a snapshot it cannot read")
    assert(spark.read.parquet(s"$store2/documents.parquet")
      .filter($"doc_id" === id2).select($"status").as[String].head() === "removed",
      "the committed delete stands behind the refused scrub")
  }

  test("delete --scrub-snapshots: already-removed ids are tolerated — the LIVE store is byte-untouched when only snapshots need scrubbing") {
    import graft.text.ProfileState
    val in = Files.createTempDirectory("graft_scrub2_in").toFile
    val store = Files.createTempDirectory("graft_scrub2_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("target.md", "confidential wisent retry subject spark engine text")
    put("keep.md", "watermark lateness checkpoint recovery for streaming")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    graft.io.Snapshots.create(store, "h1")
    val id = spark.read.parquet(s"$store/documents.parquet")
      .filter($"filename" === "target.md").select($"doc_id").as[String].head()
    // the live half completed in an EARLIER command (no snapshot flag):
    // the snapshot still holds the doc, and a plain re-delete would
    // fail loudly with "already removed"
    val r1 = Main.runDelete(spark, store, id,
      Timestamp.from(now.toInstant.plusMillis(50)))
    assert(r1.head.contains(""""snapshots_holding":["h1"]"""), r1.head)
    intercept[IllegalArgumentException] {
      Main.runDelete(spark, store, id,
        Timestamp.from(now.toInstant.plusMillis(60)))
    }
    // every live table's identity before the scrub retry…
    val liveTables = Seq("documents.parquet", "chunks.parquet",
      "embeddings.parquet", "signatures.parquet", "runlog.parquet")
    def fps() = liveTables.map(t =>
      ProfileState.dirFingerprint(new java.io.File(s"$store/$t")))
    val before = fps()
    // …survives it bit-for-bit: the retry only touches the snapshot
    val r2 = Main.runDelete(spark, store, Seq(id),
      Timestamp.from(now.toInstant.plusMillis(70)),
      purgeSnapshots = false, scrubSnapshots = true)
    assert(r2.last.contains(""""snapshots_scrubbed":["h1"]"""), r2.last)
    assert(fps() === before,
      "the live store must be untouched when only snapshots needed work")
    assert(spark.read.parquet(s"$store/.snapshots/h1/documents.parquet")
      .filter($"doc_id" === id).select($"status").as[String].head() === "removed")
    // a third run: nothing holds any more, nothing to scrub, still not
    // an error under the flag (idempotent compliance retry)
    val r3 = Main.runDelete(spark, store, Seq(id),
      Timestamp.from(now.toInstant.plusMillis(80)),
      purgeSnapshots = false, scrubSnapshots = true)
    assert(r3.last.contains(""""snapshots_scrubbed":[]"""), r3.last)
    assert(fps() === before)
  }

  test("fsck --snapshots: a planted half-scrub is counted before the re-run and clean after; the scrubbed store audits all-zero including its snapshots") {
    val in = Files.createTempDirectory("graft_fsnap_in").toFile
    val store = Files.createTempDirectory("graft_fsnap_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("t.md", "confidential okapi scrub subject engine text")
    put("k.md", "watermark lateness checkpoint recovery for streaming")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    graft.io.Snapshots.create(store, "s1")
    val snapRoot = s"$store/.snapshots/s1"
    val id = spark.read.parquet(s"$store/documents.parquet")
      .filter($"filename" === "t.md").select($"doc_id").as[String].head()
    Main.runDelete(spark, store, id, Timestamp.from(now.toInstant.plusMillis(50)))
    // plant the half-scrub: a scrub died inside s1's documents swap
    // (aside window) — the snapshot's only documents copy parked at
    // .trash, the live name gone
    val snapDocs = new java.io.File(s"$snapRoot/documents.parquet")
    require(snapDocs.renameTo(
      new java.io.File(s"$snapRoot/documents.parquet.trash")))
    // the live-only audit is clean — it cannot see snapshot damage
    val (liveLines, liveViol) = Main.runFsck(spark, store)
    assert(liveViol === 0L, liveLines.mkString("\n"))
    assert(!liveLines.exists(_.contains(""""snapshot":"s1"""")))
    // fsck --snapshots COUNTS it (and heals the parked copy — the
    // shared reader-preamble convention), tagged with the snapshot name
    val (pre, _) = Main.runFsck(spark, store, snapshots = true)
    assert(pre.exists(l =>
      l.contains(""""check":"table_restored_from_trash"""") &&
        l.contains(""""snapshot":"s1"""")), pre.mkString("\n"))
    assert(snapDocs.isDirectory, "the audit heals the parked snapshot table")
    // the documented convergence: re-run the delete under the flag
    val report = Main.runDelete(spark, store, Seq(id),
      Timestamp.from(now.toInstant.plusMillis(60)),
      purgeSnapshots = false, scrubSnapshots = true)
    assert(report.last.contains(""""snapshots_scrubbed":["s1"]"""), report.last)
    // post-scrub: all-zero including the snapshot — zero violations and
    // zero crash-residue lines anywhere, with the snapshot audited
    val (post, postViol) = Main.runFsck(spark, store, snapshots = true)
    assert(postViol === 0L, post.mkString("\n"))
    assert(!post.exists(l => l.contains("table_restored_from_trash") ||
      l.contains("stale_aside")), post.mkString("\n"))
    assert(post.exists(_.contains(""""snapshot":"s1"""")),
      "the snapshot root must actually have been audited")
    // per-snapshot evidence: the scrub is the snapshot's OWN delete
    // transaction, so its runlog carries exactly one delete entry —
    // the auditable trace PROBE_DELETE's scrub-cost row relies on
    assert(spark.read.parquet(s"$snapRoot/runlog.parquet")
      .filter($"metric" === "n_docs_deleted").count() === 1L,
      "the scrubbed snapshot's runlog must evidence its own delete")
  }

  test("fsck --repair --snapshots: a stale aside inside a snapshot root is swept only under the flag, with the snapshot's committed tables untouched") {
    val in = Files.createTempDirectory("graft_fsnaprep_in").toFile
    val store = Files.createTempDirectory("graft_fsnaprep_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("t.md", "confidential ibex scrub residue subject text")
    put("k.md", "watermark lateness checkpoint recovery for streaming")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    graft.io.Snapshots.create(store, "s1")
    val snapRoot = s"$store/.snapshots/s1"
    // plant scrub-crash residue INSIDE the snapshot: a scrub died
    // between its commit rename and the trailing cleanup, leaving the
    // committed table and its superseded aside both present. No later
    // scrub of this snapshot ever runs, so before r17 the aside's
    // bytes were retained forever.
    val snapDocs = new java.io.File(s"$snapRoot/documents.parquet")
    val snapTrash = new java.io.File(s"$snapRoot/documents.parquet.trash")
    copyTree(snapDocs, snapTrash)
    def fp() = graft.text.ProfileState.dirFingerprint(snapDocs)
    val want = fp()
    // the --snapshots audit COUNTS it as drift, tagged with the name
    val (pre, preViol) = Main.runFsck(spark, store, snapshots = true)
    assert(preViol === 0L, pre.mkString("\n"))
    assert(pre.exists(l => l.contains(""""check":"stale_aside"""") &&
      l.contains(""""snapshot":"s1"""")), pre.mkString("\n"))
    assert(snapTrash.isDirectory, "the audit itself must not sweep")
    // a flag-less repair stays OUT of snapshot roots by contract —
    // snapshot mutation is opt-in even for crash residue
    Main.runFsckRepair(spark, store)
    assert(snapTrash.isDirectory,
      "repair without --snapshots must not enter snapshot roots")
    // --repair --snapshots sweeps exactly the aside, reports it under
    // the snapshot's name, and leaves the committed table byte-identical
    val rep = Main.runFsckRepair(spark, store, snapshots = true)
    assert(rep.exists(l => l.contains("stale_aside_swept") &&
      l.contains(""""snapshot":"s1"""")), rep.mkString("\n"))
    assert(!snapTrash.exists() && snapDocs.isDirectory)
    assert(fp() === want, "sweep must not touch the committed snapshot table")
    val (post, postViol) = Main.runFsck(spark, store, snapshots = true)
    assert(postViol === 0L, post.mkString("\n"))
    assert(!post.exists(_.contains("stale_aside")), post.mkString("\n"))
  }

  test("fsck --snapshots: a snapshot whose audit dies is counted as snapshot_audit_failed and the walk continues to the rest") {
    val in = Files.createTempDirectory("graft_fsnapbad_in").toFile
    val store = Files.createTempDirectory("graft_fsnapbad_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("t.md", "confidential okapi damaged snapshot subject text")
    put("k.md", "watermark lateness checkpoint recovery for streaming")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    graft.io.Snapshots.create(store, "s1")
    graft.io.Snapshots.create(store, "s2")
    // corrupt s2's documents table WITHOUT touching the shared inodes:
    // unlinking the snapshot's dir entries leaves the live tree's own
    // hardlinks intact, then a garbage part file takes their place —
    // an existing-but-unreadable table, the shape a truncated disk or
    // botched copy produces (a MISSING table is the already-covered
    // documents_table_present violation; this is the audit ITSELF dying)
    val s2docs = new java.io.File(s"$store/.snapshots/s2/documents.parquet")
    graft.io.Tables.rmTree(s2docs)
    Files.createDirectories(s2docs.toPath)
    Files.write(new java.io.File(s2docs, "part-00000.parquet").toPath,
      "not a parquet footer".getBytes("UTF-8"))
    val (lines, nViol) = Main.runFsck(spark, store, snapshots = true)
    assert(nViol === 1L, lines.mkString("\n"))
    assert(lines.exists(l => l.contains(""""check":"snapshot_audit_failed"""") &&
      l.contains(""""snapshot":"s2"""") && l.contains(""""violation":true""")),
      lines.mkString("\n"))
    // the damaged root did NOT kill the walk: the healthy snapshot was
    // still fully audited (its tagged check lines are present, all at
    // count 0 — nViol===1 above proves neither it nor the live root
    // contributed a counted violation)
    assert(lines.exists(l => l.contains(""""snapshot":"s1"""") &&
      !l.contains("audit_failed")), lines.mkString("\n"))
    assert(!lines.exists(l => l.contains(""""snapshot":"s1"""") &&
      l.contains("audit_failed")), lines.mkString("\n"))
    val (_, liveViol) = Main.runFsck(spark, store)
    assert(liveViol === 0L, "the live-only audit must be unaffected")
  }

  test("scrub with a vector index: the snapshot's index is reconciled to its embeddings slice; --snapshot --ann serving excludes the scrubbed id") {
    import graft.search.VectorIndex
    val in = Files.createTempDirectory("graft_scrvi_in").toFile
    val store = Files.createTempDirectory("graft_scrvi_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("t.md", "confidential markhor spark query engine performance text")
    put("k.md", "watermark lateness checkpoint recovery for streaming")
    put("k2.md", "vector index probes and cell balancing maintenance notes")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    Main.runBuildVectorIndex(spark, store, "nomic", nlist = 2)
    graft.io.Snapshots.create(store, "s1")
    val snapRoot = s"$store/.snapshots/s1"
    val id = spark.read.parquet(s"$store/documents.parquet")
      .filter($"filename" === "t.md").select($"doc_id").as[String].head()
    assert(spark.read.parquet(VectorIndex.indexPath(snapRoot))
      .filter($"chunk_id".startsWith(id)).count() > 0L,
      "precondition: the snapshot's index holds the target")
    val report = Main.runDelete(spark, store, Seq(id),
      Timestamp.from(now.toInstant.plusMillis(50)),
      purgeSnapshots = false, scrubSnapshots = true)
    assert(report.last.contains(""""snapshots_scrubbed":["s1"]"""), report.last)
    // the reconcile invariant INSIDE the snapshot: its index mirrors
    // its own post-scrub embeddings slice exactly (the same invariant
    // ingest maintains live), with the scrubbed id gone from both
    def ids(path: String) = spark.read.parquet(path)
      .select($"chunk_id").as[String].collect().toSet
    val snapSlice = spark.read.parquet(s"$snapRoot/embeddings.parquet")
      .filter($"embedding_provider" ===
        VectorIndex.readMeta(VectorIndex.indexPath(snapRoot)).provider)
      .select($"chunk_id").as[String].collect().toSet
    assert(ids(VectorIndex.indexPath(snapRoot)) === snapSlice,
      "the snapshot's index must mirror its embeddings slice")
    assert(!snapSlice.exists(_.startsWith(id)))
    // --snapshot= --ann serving (the CLI's openRoot path): the stored
    // index inside the snapshot answers, and never cites the scrubbed id
    val served = Main.runSearchAnn(spark,
      graft.io.Snapshots.openRoot(store, "s1"),
      "spark query engine performance", k = 3, nprobe = 2)
    assert(served.nonEmpty, "the snapshot's index must serve")
    assert(!served.exists(_.contains(id)),
      "--snapshot --ann must not cite the scrubbed id")
    // and the sibling live index still mirrors the live slice
    val liveSlice = spark.read.parquet(s"$store/embeddings.parquet")
      .filter($"embedding_provider" ===
        VectorIndex.readMeta(VectorIndex.indexPath(store)).provider)
      .select($"chunk_id").as[String].collect().toSet
    assert(ids(VectorIndex.indexPath(store)) === liveSlice)
    val (post, nViol) = Main.runFsck(spark, store, snapshots = true)
    assert(nViol === 0L, post.mkString("\n"))
  }

  test("delete: the distinct-token register line serves ≡ rebuild afterwards, at shard-bounded rescan cost") {
    import graft.text.ProfileState
    val in = Files.createTempDirectory("graft_rexact_in").toFile
    val store = Files.createTempDirectory("graft_rexact_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    val words = Seq("zebra", "walrus", "falcon", "otter", "lynx", "heron",
                    "badger", "stoat")
    words.zipWithIndex.foreach { case (w, i) =>
      put(s"doc$i.md", s"unique animal subject $w with carrier text $i") }
    Main.runIngest(spark, in.toString, store, "nomic", now)
    val byName = spark.read.parquet(s"$store/documents.parquet")
      .select($"filename", $"doc_id").as[(String, String)].collect().toMap
    val victim = byName("doc0.md")

    Main.runDelete(spark, store, victim,
                   Timestamp.from(now.toInstant.plusMillis(50)))
    // the history-monotone carve-out is CLOSED for deletes: the served
    // report — register lines INCLUDED — is bit-identical to a full
    // rebuild, because the victim's shard was rebuilt from survivors
    val served = Main.runProfile(spark, store)
    val rebuilt = Main.runProfile(spark, store, rebuild = true)
    assert(served === rebuilt,
      s"post-delete profile must equal a rescan:\n${served.mkString("\n")}\n--\n${rebuilt.mkString("\n")}")
    // ...and at SHARD-BOUNDED cost: the runlog records exactly the
    // surviving rows of the victim's shard, not the corpus
    val postChunks = spark.read.parquet(s"$store/chunks.parquet")
      .select($"doc_id").as[String].collect().toSeq
    val expected = postChunks
      .count(id => ProfileState.shardOf(id) == ProfileState.shardOf(victim)).toLong
    val rescanned = spark.read.parquet(s"$store/runlog.parquet")
      .filter($"stage" === "delete" && $"metric" === "n_chunks_rescanned_for_regs")
      .select($"value").as[Double].collect().toSeq
    assert(rescanned === Seq(expected.toDouble),
      s"rescan bound: $rescanned vs expected $expected")
    assert(expected < postChunks.size,
      s"fixture must leave survivors outside the victim's shard: " +
        s"$expected of ${postChunks.size}")
  }

  test("re-ingest with a changed chunking: orphaned chunk_ids leave the chunks table, embeddings, and profile with the commit") {
    import graft.ingest.Ingest
    import graft.text.ProfileState
    val store = Files.createTempDirectory("graft_rechunk_store").toString
    // 600 DISTINCT words: periodic text would trip the hybrid
    // chunker's repeated-window containment guard and pack to 1 chunk
    val long = (0 until 600).map(i => s"w$i").mkString(" ")
    val t1 = Timestamp.from(now.toInstant.plusMillis(10))
    val raw = Seq(("/a/doc.md", long.getBytes("UTF-8"))).toDF("path", "content")
    val batch1 = Ingest.convertDocuments(Ingest.toDocuments(raw, lit(now)))
    Main.ingestBatch(spark, batch1, store, "nomic", now)
    val id = batch1.select($"doc_id").as[String].head()
    val before = spark.read.parquet(s"$store/chunks.parquet")
      .filter($"doc_id" === id).count()
    assert(before >= 2, s"fixture must chunk to 2+: $before")
    // a stored vector index must FOLLOW the replacement too (the id
    // diff alone cannot see a vector swapped under a live id)
    Main.runBuildVectorIndex(spark, store, "nomic", 2)
    val vecPath = graft.search.VectorIndex.indexPath(store)
    def codesOf(chunkId: String): Seq[String] =
      spark.read.parquet(vecPath).filter($"chunk_id" === chunkId)
        .drop("cell").collect().map(_.toString).toSeq.sorted
    val codesBefore = codesOf(s"${id}_chunk_1")
    // a SECOND provider embeds the same store — its rows for the
    // soon-to-be-replaced id must leave with the replacement (no later
    // granite ingest could know the content changed under the id)
    Main.ingestBatch(spark, batch1, store, "granite",
                     Timestamp.from(now.toInstant.plusMillis(5)))
    assert(spark.read.parquet(s"$store/embeddings.parquet")
      .filter($"chunk_id" === s"${id}_chunk_1" &&
              $"embedding_provider" === "granite").count() === 1)
    // the same doc_id re-delivered with DIFFERENT text (the id is
    // bytes-keyed; a changed converter or chunker config changes the
    // text the chunker sees) — the new chunking reproduces only
    // chunk_0, and the upsert alone would orphan the higher ids
    val batch2 = Ingest.convertDocuments(Ingest.toDocuments(raw, lit(t1)))
      .withColumn("text", lit("short replacement text"))
    Main.ingestBatch(spark, batch2, store, "nomic", t1)
    val after = spark.read.parquet(s"$store/chunks.parquet")
      .filter($"doc_id" === id)
    assert(after.count() === 1,
      s"orphaned chunk ids must leave with the commit: ${after.count()}")
    assert(spark.read.parquet(s"$store/embeddings.parquet")
      .filter($"chunk_id".startsWith(id)).select($"chunk_id").distinct().count() === 1,
      "orphaned chunk embeddings must leave too")
    // the surviving chunk_id's CONTENT changed, so its id-keyed cache
    // entry was stale — the commit must have re-embedded the new text,
    // not served the old vector behind the new content
    val newContent = after.select($"content").as[String].head()
    val storedVec = spark.read.parquet(s"$store/embeddings.parquet")
      .filter($"chunk_id".startsWith(id) && $"embedding_provider" === "nomic")
      .select($"embedding").as[Array[Float]].head()
    assert(storedVec.sameElements(
             graft.embed.Embedding.provider("nomic").embedOne(newContent)),
      "a replaced chunk's embedding must embed the REPLACED content")
    // ...and the stored index re-encoded the replaced vector: exactly
    // one index row for the doc (orphans reconciled away), with codes
    // that differ from the old content's
    val codesAfter = codesOf(s"${id}_chunk_1")
    assert(codesAfter.size === 1 &&
             spark.read.parquet(vecPath)
               .filter($"chunk_id".startsWith(id)).count() === 1,
      "the index must hold exactly the surviving chunk")
    assert(codesAfter !== codesBefore,
      "a replaced-in-place vector must re-encode in the stored index")
    // the OTHER provider's row left with the replacement — a stale
    // cross-provider vector must never outlive its text — and the next
    // granite ingest re-embeds the current content from scratch
    assert(spark.read.parquet(s"$store/embeddings.parquet")
      .filter($"chunk_id" === s"${id}_chunk_1" &&
              $"embedding_provider" === "granite").count() === 0,
      "a second provider's stale row must leave with the replacement")
    Main.ingestBatch(spark, batch2, store, "granite",
                     Timestamp.from(now.toInstant.plusMillis(20)))
    val graniteVec = spark.read.parquet(s"$store/embeddings.parquet")
      .filter($"chunk_id" === s"${id}_chunk_1" &&
              $"embedding_provider" === "granite")
      .select($"embedding").as[Array[Float]].head()
    assert(graniteVec.sameElements(
             graft.embed.Embedding.provider("granite").embedOne(newContent)),
      "the backfilled provider must embed the CURRENT content")
    // the profile artifact stayed synced through the fold and its
    // ADDITIVE lines serve ≡ rescan — the divergence the stale rows
    // would have caused is structurally impossible now. The register
    // line stays history-monotone through an ingest-path re-delivery
    // (the documented demotion-class decision; exact registers are the
    // DELETE path's contract), resetting on rebuild.
    assert(ProfileState.readSynced(spark, store,
      new java.io.File(s"$store/chunks.parquet")).isDefined)
    def additive(ls: Seq[String]) = ls.filterNot(_.contains("\"est_distinct\":"))
    val sv = Main.runProfile(spark, store)
    val rs = Main.runProfile(spark, store, rebuild = true)
    assert(additive(sv) === additive(rs),
      s"additive lines must fold exactly:\n${sv.mkString("\n")}\n--\n${rs.mkString("\n")}")
    assert(Main.runProfile(spark, store) ===
           Main.runProfile(spark, store, rebuild = true),
      "after the rebuild reset, served ≡ rescan entirely")
  }

  test("--snapshot queries: read-only time travel answers from history while the live store answers fresh; the snapshot stays byte-untouched") {
    val in1 = Files.createTempDirectory("graft_tt_in1").toFile
    val in2 = Files.createTempDirectory("graft_tt_in2").toFile
    val store = Files.createTempDirectory("graft_tt_store").toString
    def put(dir: java.io.File, name: String, text: String): Unit =
      Files.write(new java.io.File(dir, name).toPath, text.getBytes("UTF-8"))
    val base = "spark query engine zebra performance tuning guide for " +
      "training pipelines with shuffle partitioning and broadcast joins"
    put(in1, "a.md", base)
    put(in1, "b.txt", "watermark lateness checkpoint recovery for streaming")
    // the near-dup that will DEMOTE a.md after the snapshot is taken
    put(in2, "a2.md", base.replace("zebra", "alpaca") +
      " plus watermark checkpoints and recovery drills at scale")

    Main.runIngest(spark, in1.toString, store, "nomic", now)
    val aId = spark.read.parquet(s"$store/documents.parquet")
      .filter($"filename" === "a.md").select($"doc_id").as[String].head()
    val preProfile = Main.runProfile(spark, store)
    graft.io.Snapshots.create(store, "s1")
    Main.runIngest(spark, in2.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(5)))
    assert(spark.read.parquet(s"$store/documents.parquet")
      .filter($"doc_id" === aId).select($"status").as[String].head()
      === "duplicate", "fixture must demote the snapshotted doc")

    val snapRoot = graft.io.Snapshots.openRoot(store, "s1")
    val fpBefore = graft.text.ProfileState
      .dirFingerprint(new java.io.File(snapRoot))

    // search: the live store no longer knows 'zebra' (the winner spells
    // it 'alpaca'); the snapshot still answers with the original chunk
    assert(!Main.runSearch(spark, store, "zebra performance", "nomic", 3)
      .exists(_.contains("zebra")))
    assert(Main.runSearch(spark, snapRoot, "zebra performance", "nomic", 3)
      .exists(_.contains("zebra")))
    // get: live serves the demoted tombstone-ish row (duplicate, no
    // chunks); the snapshot serves the pre-ingest completed doc WITH
    // its chunks
    val liveGet = Main.runGet(spark, store, aId)
    assert(liveGet.head.contains("\"status\":\"duplicate\"") &&
           liveGet.length === 1, liveGet.mkString("\n"))
    val snapGet = Main.runGet(spark, snapRoot, aId)
    assert(snapGet.head.contains("\"status\":\"completed\"") &&
           snapGet.length > 1, snapGet.mkString("\n"))
    // profile: the snapshot's own profile_state artifact travels in the
    // hardlink tree and is IN SYNC with the snapshot's chunks table
    // (relative names + sizes survive linking), so the read-only path
    // serves from state — and answers exactly the pre-ingest report
    assert(Main.runProfile(spark, snapRoot, readOnly = true) === preProfile)
    assert(Main.runProfile(spark, store) !== preProfile,
      "the live profile must have moved on")
    // immutability: every query above left the snapshot byte-untouched
    assert(graft.text.ProfileState
      .dirFingerprint(new java.io.File(snapRoot)) === fpBefore,
      "read-only snapshot queries must not write into the snapshot tree")
    // the writing escape hatch is refused on snapshots at the CLI gate
    // (Main.main), and unknown snapshot names fail loudly everywhere
    intercept[IllegalArgumentException] {
      graft.io.Snapshots.openRoot(store, "nope")
    }
    intercept[IllegalArgumentException] {
      graft.io.Snapshots.openRoot(store, "../escape")
    }
  }

  test("a stored postings index follows demotion and re-ingest: stale docs stop matching, no double postings") {
    import graft.ingest.Ingest
    val in = Files.createTempDirectory("graft_postdem_in").toFile
    val store = Files.createTempDirectory("graft_postdem_store").toString
    val content = "spark query engine performance tuning guide for training pipelines"
    val candidates = (0 to 9).map(i => s"v$i.md")
    val ids = Ingest.toDocuments(
        candidates.map(n => (s"/x/$n", content.getBytes("UTF-8"))).toDF("path", "content"),
        lit(now))
      .select($"filename", $"doc_id").as[(String, String)].collect().toMap
    val loser = candidates.maxBy(ids)
    val winner = candidates.minBy(ids)
    def put(name: String): Unit =
      Files.write(new java.io.File(in, name).toPath, content.getBytes("UTF-8"))
    def phraseHits(): Seq[(String, Long)] =
      Main.runPhrase(spark, store, "performance tuning guide")
        .map { line =>
          val id = """"chunk_id":"([^"]+)"""".r.findFirstMatchIn(line).get.group(1)
          val n = """"n_occurrences":(\d+)""".r.findFirstMatchIn(line).get.group(1).toLong
          (id, n)
        }

    put(loser)
    Main.runIngest(spark, in.toString, store, "nomic", now)
    Main.runBuildPostings(spark, store, nBuckets = 16)
    val hits1 = phraseHits()
    assert(hits1.nonEmpty && hits1.forall(_._1.startsWith(ids(loser))),
           s"run-1 index must serve the loser's chunks: $hits1")

    // run 2 demotes the loser: its postings must leave the index and
    // the winner's must arrive — through ingest's own maintenance, no
    // rebuild
    put(winner)
    Main.runIngest(spark, in.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(5)))
    val hits2 = phraseHits()
    assert(hits2.nonEmpty && hits2.forall(_._1.startsWith(ids(winner))),
           s"post-demotion phrase hits must be the winner's chunks only: $hits2")

    // run 3 re-ingests the winner unchanged: remove-then-append upsert
    // semantics — occurrence counts must NOT double
    Main.runIngest(spark, in.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(10)))
    assert(phraseHits() == hits2,
           "re-ingest must not duplicate postings")
  }

  test("a doc delivered TWICE in one batch appends its postings once, like the store upsert") {
    import graft.ingest.Ingest
    // same bytes + same filename under two paths → ONE doc_id, two
    // batch rows; the chunks commit collapses them (per-chunk_id
    // upsert) and the postings append must match, not double-count
    val in = Files.createTempDirectory("graft_dupbatch_in").toFile
    val store = Files.createTempDirectory("graft_dupbatch_store").toString
    Files.write(new java.io.File(in, "seed.md").toPath,
      "unrelated seed document about cooking pasta".getBytes("UTF-8"))
    Main.runIngest(spark, in.toString, store, "nomic", now)
    Main.runBuildPostings(spark, store, nBuckets = 16)

    val content = "vector quantization codebook training pipeline notes"
    val batch = Ingest.convertDocuments(Ingest.toDocuments(
      Seq(("/a/dup.md", content.getBytes("UTF-8")),
          ("/b/dup.md", content.getBytes("UTF-8"))).toDF("path", "content"),
      lit(Timestamp.from(now.toInstant.plusMillis(5)))))
    Main.ingestBatch(spark, batch, store, "nomic",
                     Timestamp.from(now.toInstant.plusMillis(5)))

    val stored = Search.phraseOccurrencesStored(
        spark, s"$store/postings.idx", "chunk_id", "codebook training")
      .orderBy("chunk_id")
      .as[(String, Long, Long)].collect().toSeq
    val inline = Search.phraseOccurrences(
        spark.read.parquet(s"$store/chunks.parquet")
          .select($"chunk_id", $"content"),
        "chunk_id", "content", "codebook training")
      .orderBy("chunk_id")
      .as[(String, Long, Long)].collect().toSeq
    assert(stored.nonEmpty, "the duplicated doc's phrase must match")
    assert(stored == inline,
           s"index must mirror the committed chunks exactly: $stored vs $inline")
  }

  test("vector index lifecycle: Main index builds, --ann serves the exact top-k, ingest reconciles appends and demotions") {
    import graft.ingest.Ingest
    import graft.search.{Ann, VectorIndex}
    val in = Files.createTempDirectory("graft_vec_in").toFile
    val store = Files.createTempDirectory("graft_vec_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))

    // a near-dup pair whose loser arrives FIRST (batch 2's winner
    // demotes it — the maintenance case that must also leave the index)
    val content = "spark query engine performance tuning guide for training pipelines"
    val candidates = (0 to 9).map(i => s"v$i.md")
    val ids = Ingest.toDocuments(
        candidates.map(n => (s"/x/$n", content.getBytes("UTF-8"))).toDF("path", "content"),
        lit(now))
      .select($"filename", $"doc_id").as[(String, String)].collect().toMap
    val loser = candidates.maxBy(ids)
    val winner = candidates.minBy(ids)

    put(loser, content)
    put("b.md", "unrelated cooking recipe with butter and flour")
    put("c.md", "violin concerto in d major sheet music")
    put("d.md", "gardening tips for tomato plants in summer")
    Main.runIngest(spark, in.toString, store, "nomic", now)

    val nIndexed = Main.runBuildVectorIndex(spark, store, "nomic", nlist = 4)
    def storedIds(): Set[String] = spark.read.parquet(s"$store/embeddings.parquet")
      .filter($"embedding_provider" === "nomic")
      .select($"chunk_id").as[String].collect().toSet
    def indexIds(): Set[String] = spark.read
      .parquet(VectorIndex.indexPath(store))
      .select($"chunk_id").as[String].collect().toSet
    assert(nIndexed === storedIds().size)
    assert(indexIds() === storedIds(), "built index must mirror the provider slice")

    // the exact integer-L2 brute ranking over the committed slice is
    // the ground truth the stored probe must reproduce at full nprobe
    // (same grid, same tie order)
    val query = "spark query engine performance"
    def bruteTopK(k: Int): Seq[(String, Long)] = {
      val qv = graft.embed.Embedding.embedQuery(query, "nomic").toSeq.map(Ann.quantizeL)
      val q = typedLit(qv)
      val qn = qv.map(x => x * x).sum
      val iv = Ann.intVec($"embedding")
      spark.read.parquet(s"$store/embeddings.parquet")
        .filter($"embedding_provider" === "nomic")
        .withColumn("d2", Ann.intDot(iv, iv) - lit(2L) * Ann.intDot(iv, q) + lit(qn))
        .orderBy($"d2".asc, $"chunk_id")
        .limit(k).select($"chunk_id", $"d2").as[(String, Long)].collect().toSeq
    }
    def annTopK(k: Int): Seq[(String, Long)] =
      Main.runSearchAnn(spark, store, query, k, nprobe = 8).map { line =>
        val id = """"chunk_id":"([^"]+)"""".r.findFirstMatchIn(line).get.group(1)
        val d2 = """"d2":(-?\d+)""".r.findFirstMatchIn(line).get.group(1).toLong
        (id, d2)
      }
    assert(annTopK(3) === bruteTopK(3), "stored ANN must serve the exact top-k")
    assert(annTopK(1).head._1.startsWith(ids(loser)),
           "the spark-ish query's top hit must be the spark doc")

    // batch 2: the winner demotes the loser, and a brand-new doc
    // arrives — ingest's reconcile must mirror both into the index
    // with no rebuild
    put(winner, content)
    put("e.md", "completely new document about sailing boats and knots")
    Main.runIngest(spark, in.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(5)))
    assert(spark.read.parquet(s"$store/documents.parquet")
      .filter($"doc_id" === ids(loser)).select($"status").as[String].head()
      === "duplicate")
    assert(indexIds() === storedIds(),
           "post-ingest index must mirror the reconciled provider slice")
    assert(!indexIds().exists(_.startsWith(ids(loser))),
           "the demoted doc's rows must leave the index")
    assert(indexIds().exists(_.startsWith(ids(winner))),
           "the winner's rows must arrive in the index")
    assert(annTopK(3) === bruteTopK(3),
           "the reconciled index must still serve the exact top-k")
    assert(annTopK(1).head._1.startsWith(ids(winner)))

    // the scheduled maintenance command runs against the served store:
    // nothing is hot at this size (no split actions), compaction
    // reports its file counts, the sidecar still serves, and the
    // ranking is unchanged
    val balLines = Main.runBalanceVectorIndex(spark, store, maxRows = 100L)
    assert(balLines.nonEmpty && balLines.last.contains("files_before"))
    assert(!balLines.exists(_.contains("\"outcome\":\"split\"")))
    assert(annTopK(3) === bruteTopK(3),
           "balance+compact must not change the served ranking")

    // hybrid serving: RRF over BOTH stored tiers — on a query the doc
    // matches lexically AND semantically, both rankings put it first
    // (n_lists = 2) and the fused top hit is the winner's chunk
    val hyb = Main.runSearchHybrid(spark, store, query, k = 3, nprobe = 8)
    assert(hyb.nonEmpty)
    val topHit = """"chunk_id":"([^"]+)"""".r.findFirstMatchIn(hyb.head).get.group(1)
    assert(topHit.startsWith(ids(winner)), s"hybrid top hit: ${hyb.head}")
    assert(hyb.head.contains("\"n_lists\":2"),
           s"both tiers must rank the winner: ${hyb.head}")

    // diversified serving: the MMR pick starts at the same exact
    // top-1 (pure relevance, red = 0) and returns k distinct chunks
    val mmrLines = Main.runSearchMmr(spark, store, query, "nomic", 3)
    assert(mmrLines.size === 3)
    assert(mmrLines.head.contains("\"rnk\":1") &&
           mmrLines.head.contains("\"red\":0"), mmrLines.head)
    val mmrTop = """"chunk_id":"([^"]+)"""".r.findFirstMatchIn(mmrLines.head).get.group(1)
    assert(mmrTop === bruteTopK(1).head._1,
           "MMR's first pick is the exact most-relevant chunk")

    // the monitoring commands close the loop: rebuild on the current
    // store (it drifted by construction — batch 2 added docs), then
    // the drift check replays the sidecar's own recipe on stationary
    // data and every shift must be exactly 0; the recall monitor at
    // full coverage must report 100 (the stored probe IS the exact
    // ranking when every cell is probed and the ADC cut is uncut)
    Main.runBuildVectorIndex(spark, store, "nomic", nlist = 4)
    val dr = Main.runDriftCheck(spark, store)
    assert(dr.last.contains("\"max_shift_d2\":0"),
           s"stationary store must show zero drift: $dr")
    val rec = Main.runRecallCheck(spark, store, k = 2, nprobe = 8, nQueries = 3)
    assert(rec.last.contains("\"mean_recall_pct\":100"),
           s"full-coverage recall must be 100: $rec")
  }

  test("a demotion commit invalidates EVERY provider's cached results, not just the ingested one") {
    import graft.ingest.Ingest
    val in = Files.createTempDirectory("graft_demcache_in").toFile
    val store = Files.createTempDirectory("graft_demcache_store").toString
    val content = "spark query engine performance tuning guide for training pipelines"
    val candidates = (0 to 9).map(i => s"v$i.md")
    val ids = Ingest.toDocuments(
        candidates.map(n => (s"/x/$n", content.getBytes("UTF-8"))).toDF("path", "content"),
        lit(now))
      .select($"filename", $"doc_id").as[(String, String)].collect().toMap
    val loser = candidates.maxBy(ids)
    val winner = candidates.minBy(ids)
    def put(name: String): Unit =
      Files.write(new java.io.File(in, name).toPath, content.getBytes("UTF-8"))

    // corpus = loser only, embedded by BOTH providers; granite search cached
    put(loser)
    Main.runIngest(spark, in.toString, store, "nomic", now)
    Main.runIngest(spark, in.toString, store, "granite",
                   Timestamp.from(now.toInstant.plusMillis(1)))
    val q = "spark query engine performance"
    val (gr1, gh1) = Main.runSearchCached(spark, store, q, "granite", 3)
    assert(!gh1 && gr1.nonEmpty)
    val (gr2, gh2) = Main.runSearchCached(spark, store, q, "granite", 3)
    assert(gh2 && gr2 == gr1, "granite result cached")

    // a NOMIC ingest whose keep-one DEMOTES the loser: the prune drops
    // granite's embedding rows for the loser too, so granite's cached
    // result now points at deleted chunks — it must be invalidated
    // even though the ingest ran under the other provider
    put(winner)
    Main.runIngest(spark, in.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(5)))
    val cacheF = new java.io.File(s"$store/search_cache.parquet")
    val graniteKeys =
      if (!cacheF.exists()) 0L
      else spark.read.parquet(cacheF.toString)
        .filter($"embedding_provider" === "granite").count()
    assert(graniteKeys === 0,
           "a demotion commit must invalidate other providers' cached keys")
    val (gr3, gh3) = Main.runSearchCached(spark, store, q, "granite", 3)
    assert(!gh3, "post-demotion granite search must recompute, not serve stale chunks")
    assert(gr3.forall(!_.contains(ids(loser))),
           s"recomputed result must not reference the demoted doc: $gr3")
  }

  test("reindex: drift below the gate leaves the index alone; above it retrains to zero drift and exact serving") {
    import graft.search.{Ann, VectorIndex}
    val in = Files.createTempDirectory("graft_reidx_in").toFile
    val store = Files.createTempDirectory("graft_reidx_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("a.md", "spark query engine performance tuning guide")
    put("b.md", "unrelated cooking recipe with butter and flour")
    put("c.md", "violin concerto in d major sheet music")
    put("d.md", "gardening tips for tomato plants in summer")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    Main.runBuildVectorIndex(spark, store, "nomic", nlist = 4)
    val builtMeta = VectorIndex.readMeta(VectorIndex.indexPath(store))

    // batch 2 drifts the corpus: new docs join the training sample, so
    // the fresh replay no longer reproduces the sidecar's centroids
    put("e.md", "completely new document about sailing boats and knots")
    put("f.md", "astronomy field guide to northern constellations")
    Main.runIngest(spark, in.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(5)))
    val drifted = Main.runDriftCheck(spark, store).last
    val maxShift = """"max_shift_d2":(\d+)""".r.findFirstMatchIn(drifted)
      .get.group(1).toLong
    assert(maxShift > 0, s"batch 2 must register as drift: $drifted")

    // gate above the measured drift: the cheap steady-state outcome —
    // no retrain, the sidecar byte-identical
    val skipped = Main.runReindex(spark, store, Some(maxShift))
    assert(skipped === Seq(
      s"""{"retrained":false,"max_shift_d2":$maxShift,"threshold":$maxShift}"""))
    assert(VectorIndex.readMeta(VectorIndex.indexPath(store)) === builtMeta,
           "a skipped reindex must not touch the sidecar")

    // gate below it: retrain under the sidecar's own recipe; drift
    // reads zero afterwards and the index mirrors the provider slice
    val retrained = Main.runReindex(spark, store, Some(maxShift - 1))
    assert(retrained.head.contains("\"retrained\":true"), retrained.toString)
    val after = VectorIndex.readMeta(VectorIndex.indexPath(store))
    assert(after.centroids !== builtMeta.centroids,
           "retraining on a drifted corpus must move the centroids")
    assert((after.nlist, after.codebookK, after.m, after.samplePct, after.rounds)
      === (builtMeta.nlist, builtMeta.codebookK, builtMeta.m,
           builtMeta.samplePct, builtMeta.rounds),
      "the retrain must replay the sidecar's own recipe, not defaults")
    assert(Main.runDriftCheck(spark, store).last.contains("\"max_shift_d2\":0"),
           "post-retrain drift must read zero on the stationary store")

    // the retrained index serves the exact ranking at full coverage
    val query = "spark query engine performance"
    val qv = graft.embed.Embedding.embedQuery(query, "nomic").toSeq.map(Ann.quantizeL)
    val q = typedLit(qv)
    val qn = qv.map(x => x * x).sum
    val iv = Ann.intVec($"embedding")
    val brute = spark.read.parquet(s"$store/embeddings.parquet")
      .filter($"embedding_provider" === "nomic")
      .withColumn("d2", Ann.intDot(iv, iv) - lit(2L) * Ann.intDot(iv, q) + lit(qn))
      .orderBy($"d2".asc, $"chunk_id")
      .limit(3).select($"chunk_id", $"d2").as[(String, Long)].collect().toSeq
    val served = Main.runSearchAnn(spark, store, query, 3, nprobe = 8).map { line =>
      (""""chunk_id":"([^"]+)"""".r.findFirstMatchIn(line).get.group(1),
       """"d2":(-?\d+)""".r.findFirstMatchIn(line).get.group(1).toLong)
    }
    assert(served === brute, "retrained index must serve the exact top-k")

    // no gate = unconditional rebuild, even at zero drift
    val forced = Main.runReindex(spark, store, None)
    assert(forced.head.contains("\"retrained\":true") &&
           forced.head.contains("\"max_shift_d2\":0"), forced.toString)
  }

  test("curate --semdedup: a shared verbatim chunk links docs the minhash tier keeps; one survivor exports") {
    val in = Files.createTempDirectory("graft_semdedup_in").toFile
    val store = Files.createTempDirectory("graft_semdedup_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    // docs A and B share a REPEATED 264-word opening passage (few
    // distinct shingles — doc-level minhash Jaccard stays tiny, so
    // ingest dedup keeps both) followed by long fully-distinct tails.
    // The chunker cuts their identical first chunk out of the shared
    // prefix → identical chunk content → identical provider embedding
    // → a cos=1 within-cell pair → a doc edge only --semdedup sees.
    val shared = Seq.fill(12)(
      "the quick brown fox jumps over the lazy dog while the bright " +
      "morning sun rises over the quiet valley and the river flows").mkString(" ")
    val tailA = (1 to 60).map(i => s"va$i wa$i xa$i").mkString(" ")
    val tailB = (1 to 60).map(i => s"vb$i wb$i xb$i").mkString(" ")
    put("a.txt", s"$shared $tailA")
    put("b.txt", s"$shared $tailB")
    put("c.txt", "we walked to the old library in the afternoon and read the books there")
    put("d.txt", "the small boat sailed across the calm lake before the evening came down")
    val r = Main.runIngest(spark, in.toString, store, "nomic", now)
    assert(r.nDocs === 4 && r.nFailed === 0)
    // precondition: the minhash tier kept BOTH shared-passage docs
    val docsTbl = spark.read.parquet(s"$store/documents.parquet")
    assert(docsTbl.filter($"status" === "duplicate").count() === 0,
      "fixture broke: ingest minhash demoted a doc the test needs kept")

    // --semdedup without a vector index fails loudly, like --embdecon
    val outFail = Files.createTempDirectory("graft_semdedup_out0").toString
    intercept[IllegalArgumentException] {
      Main.runCurate(spark, store, outFail, "nomic", semDedup = true)
    }

    Main.runBuildVectorIndex(spark, store, "nomic", nlist = 2)
    val out = Files.createTempDirectory("graft_semdedup_out").toString
    val manifest = Main.runCurate(spark, store, out, "nomic", semDedup = true)
    def m(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(manifest).map(_.group(1).toLong)
        .getOrElse(fail(s"$k missing from manifest: $manifest"))
    assert(m("docs_in") === 4 && m("docs_kept") === 3 &&
           m("dropped_semdup") === 1 && m("dropped_quality") === 0, manifest)
    val rows = spark.read.json(out)
    // exactly ONE of the two shared-passage docs exports (the group's
    // survivor); the loser contributes no chunks at all
    val sharedDocs = rows.filter($"content".contains("quick brown fox"))
      .select($"doc_id").distinct().collect().map(_.getString(0)).toSeq
    assert(sharedDocs.size === 1, s"expected one survivor, got $sharedDocs")
    assert(rows.select($"doc_id").distinct().count() === 3)
    val loserTail = if (rows.filter($"content".contains("va1 ")).count() > 0)
      "vb1 " else "va1 "
    assert(rows.filter($"content".contains(loserTail)).count() === 0)

    // without the flag the same store exports all four docs — the
    // stage is strictly opt-in
    val out2 = Files.createTempDirectory("graft_semdedup_out2").toString
    val manifest2 = Main.runCurate(spark, store, out2, "nomic")
    assert(!manifest2.contains("dropped_semdup"), manifest2)
    assert(spark.read.json(out2).select($"doc_id").distinct().count() === 4)
  }

  test("curate: per-source quality gate drops the gibberish doc; output is split-partitioned training JSONL") {
    val in = Files.createTempDirectory("graft_curate_in").toFile
    val store = Files.createTempDirectory("graft_curate_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    // five same-source docs: four normal English (stopword-dense), one
    // zero-stopword gibberish — the per-source p25 gate (cutoff = the
    // 2nd-smallest score at n=5) must drop exactly the gibberish
    put("a.txt", "the quick brown fox jumps over the lazy dog and runs to the barn")
    put("b.txt", "it is a truth universally acknowledged that a reader wants the text")
    put("c.txt", "we are going to the market in the morning for some fresh bread")
    put("d.txt", "this is the story of a small town and the people in it")
    put("e.txt", "xqjzv qwerty zxcvb plugh hjkl wvxyz qqzzt")
    val r = Main.runIngest(spark, in.toString, store, "nomic", now)
    assert(r.nDocs === 5 && r.nFailed === 0)

    val out = Files.createTempDirectory("graft_curate_out").toString
    val manifest = Main.runCurate(spark, store, out, "nomic")
    def m(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(manifest).map(_.group(1).toLong)
        .getOrElse(fail(s"$k missing from manifest: $manifest"))
    assert(m("docs_in") === 5 && m("docs_kept") === 4 &&
           m("dropped_quality") === 1, manifest)
    assert(m("missing_embedding") === 0, manifest)

    val rows = spark.read.json(out)
    // the gibberish doc ingested CLEANLY into the store (dropped by
    // the gate, not by ingest) yet none of its chunks are exported
    val docsTbl = spark.read.parquet(s"$store/documents.parquet")
    assert(docsTbl.filter($"status".isin("failed", "duplicate")).count() === 0)
    assert(rows.filter($"content".contains("xqjzv")).count() === 0)
    assert(rows.select($"doc_id").distinct().count() === 4)

    // split partitioning: hive-style dirs, every doc in exactly ONE
    // split, and the manifest's per-split counts match the files
    assert(rows.groupBy($"doc_id")
      .agg(countDistinct($"split").as("ns"))
      .filter($"ns" =!= 1).count() === 0)
    val bySplit = rows.groupBy($"split").count()
      .collect().map(r2 => r2.getString(0) -> r2.getLong(1)).toMap
    assert(m("train") === bySplit.getOrElse("train", 0L), manifest)
    assert(m("val") === bySplit.getOrElse("val", 0L), manifest)
    assert(m("test") === bySplit.getOrElse("test", 0L), manifest)
    assert(m("train") + m("val") + m("test") === rows.count(), manifest)

    // every exported row carries its embedding and a positive token
    // count — the training surface is complete, not silently partial
    assert(rows.filter($"embedding".isNull || size($"embedding") === 0).count() === 0)
    assert(rows.filter($"n_tokens" <= 0).count() === 0)

    // --decon: a benchmark file verbatim-copying doc c must drop it
    // (counted as contamination, NOT as a quality drop), on top of the
    // quality gate's gibberish drop
    val benchDir = Files.createTempDirectory("graft_curate_bench").toFile
    Files.write(new java.io.File(benchDir, "bench.txt").toPath,
      "we are going to the market in the morning for some fresh bread"
        .getBytes("UTF-8"))
    val out2 = Files.createTempDirectory("graft_curate_out2").toString
    val manifest2 = Main.runCurate(spark, store, out2, "nomic",
                                   Some(benchDir.toString))
    def m2(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(manifest2).map(_.group(1).toLong)
        .getOrElse(fail(s"$k missing from manifest: $manifest2"))
    assert(m2("docs_in") === 5 && m2("docs_kept") === 3 &&
           m2("dropped_quality") === 1 && m2("dropped_contaminated") === 1,
           manifest2)
    val rows2 = spark.read.json(out2)
    assert(rows2.filter($"content".contains("market in the morning")).count() === 0)
    assert(rows2.select($"doc_id").distinct().count() === 3)

    // --embdecon without a vector index fails loudly — the trained
    // quantizer IS the blocking key, there is no fallback
    val benchDir2 = Files.createTempDirectory("graft_curate_bench2").toFile
    Files.write(new java.io.File(benchDir2, "eval.txt").toPath,
      "this is the story of a small town and the people in it".getBytes("UTF-8"))
    val out3 = Files.createTempDirectory("graft_curate_out3").toString
    intercept[IllegalArgumentException] {
      Main.runCurate(spark, store, out3, "nomic", None, Some(benchDir2.toString))
    }

    // with the index built, the benchmark-equal doc drops as SEMANTIC
    // contamination (isolated from the verbatim tier: no --decon here)
    Main.runBuildVectorIndex(spark, store, "nomic", nlist = 2)
    val manifest3 = Main.runCurate(spark, store, out3, "nomic", None,
                                   Some(benchDir2.toString))
    def m3(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(manifest3).map(_.group(1).toLong)
        .getOrElse(fail(s"$k missing from manifest: $manifest3"))
    assert(m3("docs_in") === 5 && m3("docs_kept") === 3 &&
           m3("dropped_quality") === 1 && m3("dropped_semantic") === 1 &&
           m3("dropped_contaminated") === 0, manifest3)
    val rows3 = spark.read.json(out3)
    assert(rows3.filter($"content".contains("story of a small town")).count() === 0)
    assert(rows3.select($"doc_id").distinct().count() === 3)

    // --pack: every row gains seq_no; within a (split, seq_no) all
    // chunks but the last fit the running budget (the q66 div
    // invariant), and the packing is deterministic across runs
    val out4 = Files.createTempDirectory("graft_curate_out4").toString
    Main.runCurate(spark, store, out4, "nomic", packBudget = Some(64))
    val rows4 = spark.read.json(out4)
    assert(rows4.filter($"seq_no".isNull).count() === 0)
    val overfull = rows4
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"split", $"seq_no").orderBy($"chunk_id".desc)))
      .filter($"rk" > 1) // all but the LAST chunk of each sequence
      .groupBy($"split", $"seq_no").agg(sum($"n_tokens").as("t"))
      .filter($"t" >= 64)
    assert(overfull.count() === 0)
    val out5 = Files.createTempDirectory("graft_curate_out5").toString
    Main.runCurate(spark, store, out5, "nomic", packBudget = Some(64))
    val a5 = spark.read.json(out5).select($"chunk_id", $"seq_no")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val a4 = rows4.select($"chunk_id", $"seq_no")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a4 === a5, "packing must be deterministic across runs")

    // every curate run logged its funnel to the runlog, beside ingest
    val runlog = spark.read.parquet(s"$store/runlog.parquet")
    assert(runlog.filter($"stage" === "curate" && $"metric" === "docs_in" &&
                         $"value" === 5.0).count() >= 1)
    assert(runlog.filter($"stage" === "ingest").count() >= 1)
  }

  test("curate --redact: exported text is scrubbed, counted per category, and token-counted AFTER the scrub") {
    val in = Files.createTempDirectory("graft_redact_in").toFile
    val store = Files.createTempDirectory("graft_redact_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("a.txt", "contact the editor at jane.doe@example.com for the " +
                 "full notes and see https://example.com/more today")
    put("b.txt", "the server at 10.0.0.1 is where we keep all of the data for it")
    Main.runIngest(spark, in.toString, store, "nomic", now)

    val out = Files.createTempDirectory("graft_redact_out").toString
    val manifest = Main.runCurate(spark, store, out, "nomic", redact = true)
    def m(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(manifest).map(_.group(1).toLong)
        .getOrElse(fail(s"$k missing from manifest: $manifest"))
    assert(m("pii_email") === 1 && m("pii_url") === 1 && m("pii_ip") === 1,
           manifest)

    val rows = spark.read.json(out)
    // the raw PII never reaches the export; the placeholders do
    assert(rows.filter($"content".contains("jane.doe") ||
                       $"content".contains("example.com") ||
                       $"content".contains("10.0.0.1")).count() === 0)
    assert(rows.filter($"content".contains("<EMAIL>")).count() === 1)
    assert(rows.filter($"content".contains("<URL>")).count() === 1)
    assert(rows.filter($"content".contains("<IP>")).count() === 1)
    // per-row audit columns were internal — they must not ship
    assert(!rows.columns.contains("n_email"), rows.columns.mkString(","))
    // n_tokens measures the REDACTED text (what the trainer sees), not
    // the original: recomputing the lexer count over the exported
    // content must agree row for row
    assert(rows.filter(
      size(graft.text.TextStats.bpeTokens($"content")).cast("long")
        =!= $"n_tokens").count() === 0)
    // the scrub counts land in the runlog beside the funnel
    val runlog = spark.read.parquet(s"$store/runlog.parquet")
    assert(runlog.filter($"stage" === "curate" && $"metric" === "pii_email" &&
                         $"value" === 1.0).count() === 1)
    // without --redact the same store exports the raw text and no
    // pii keys appear — the scrub is opt-in, never silent
    val out2 = Files.createTempDirectory("graft_redact_out2").toString
    val manifest2 = Main.runCurate(spark, store, out2, "nomic")
    assert(!manifest2.contains("pii_email"), manifest2)
    assert(spark.read.json(out2)
      .filter($"content".contains("jane.doe@example.com")).count() === 1)
  }

  test("curate --target/--gopher: DSIR selection keeps the target-leaning docs; the rule bundle drops the bullet doc; gates chain in order") {
    val in = Files.createTempDirectory("graft_sel_in").toFile
    val store = Files.createTempDirectory("graft_sel_store").toString
    def put(dir: java.io.File, name: String, text: String): Unit =
      Files.write(new java.io.File(dir, name).toPath, text.getBytes("UTF-8"))
    // all five docs tie on stopword density (the adaptive gate keeps
    // every one), so the drops below are attributable to the NEW gates
    put(in, "phys1.txt", "the quantum lattice of spin coherence with detector measured drift")
    put(in, "phys2.txt", "the quantum lattice of spin entanglement with measurement decay cycle")
    put(in, "cook1.txt", "the butter flour of sugar oven with whisk batter tray")
    put(in, "cook2.txt", "the butter flour of sugar pan with dough yeast loaf")
    put(in, "bullets.txt", "- the gadget of parts with gears\n- the gadget of parts with gears")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    val targetDir = Files.createTempDirectory("graft_sel_target").toFile
    put(targetDir, "domain.txt",
        "the quantum lattice of spin coherence with entanglement measurement detector")

    def m(manifest: String, k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(manifest).map(_.group(1).toLong)
        .getOrElse(fail(s"$k missing from manifest: $manifest"))

    // --target: only the physics docs carry positive importance weight
    val outT = Files.createTempDirectory("graft_sel_outT").toString
    val mT = Main.runCurate(spark, store, outT, "nomic",
                            targetDir = Some(targetDir.toString))
    assert(m(mT, "docs_in") === 5 && m(mT, "docs_kept") === 2 &&
           m(mT, "dropped_irrelevant") === 3 &&
           m(mT, "dropped_quality") === 0, mT)
    val rowsT = spark.read.json(outT)
    assert(rowsT.filter($"content".contains("butter")).count() === 0)
    assert(rowsT.filter($"content".contains("quantum")).count() === 2)

    // --gopher: only the all-bullet doc violates the bundle (word
    // floor lowered to 10 — the fixtures are short on purpose)
    val outG = Files.createTempDirectory("graft_sel_outG").toString
    val mG = Main.runCurate(spark, store, outG, "nomic",
                            gopherMinWords = Some(10))
    assert(m(mG, "docs_in") === 5 && m(mG, "docs_kept") === 4 &&
           m(mG, "dropped_gopher") === 1, mG)
    assert(spark.read.json(outG)
      .filter($"content".contains("gadget")).count() === 0)

    // both: the bullet doc is ALSO irrelevant, and relevance sits
    // before the rule bundle in the chain — it must be counted there,
    // never twice
    val outB = Files.createTempDirectory("graft_sel_outB").toString
    val mB = Main.runCurate(spark, store, outB, "nomic",
                            targetDir = Some(targetDir.toString),
                            gopherMinWords = Some(10))
    assert(m(mB, "docs_kept") === 2 && m(mB, "dropped_irrelevant") === 3 &&
           m(mB, "dropped_gopher") === 0, mB)
    // flags off → no selection keys in the manifest (opt-in, like pii)
    val mOff = Main.runCurate(spark, store,
      Files.createTempDirectory("graft_sel_outO").toString, "nomic")
    assert(!mOff.contains("dropped_irrelevant") &&
           !mOff.contains("dropped_gopher"), mOff)
  }

  test("search --prf: expansion surfaces a store chunk the literal query cannot see") {
    val in = Files.createTempDirectory("graft_prf_in").toFile
    val store = Files.createTempDirectory("graft_prf_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("a.txt", "streaming watermark watermark watermark lateness")
    put("b.txt", "watermark lateness watermark note")
    put("c.txt", "cooking bread butter flour morning meal")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    val lines = Main.runSearchPrf(spark, store, "streaming", k = 10)
    // doc b shares no term with the query — only the mined expansion
    // (watermark, from the seed doc) can surface it
    assert(lines.exists(_.contains("watermark lateness watermark note")),
           lines.mkString("\n"))
    assert(!lines.exists(_.contains("cooking")), lines.mkString("\n"))
    // the seed doc still ranks first (it matches seed AND expansion)
    assert(lines.head.contains("\"rnk\":1") &&
           lines.head.contains("streaming"), lines.head)
  }

  test("search --suggest: a typo'd query term gets its stored spelling back, ranked by corpus frequency") {
    val in = Files.createTempDirectory("graft_sug_in").toFile
    val store = Files.createTempDirectory("graft_sug_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("a.txt", "watermark watermark watermark lateness streaming")
    put("b.txt", "watermark lateness checkpoint recovery")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    // "watermar" is distance 1 from "watermark" (one deletion)
    val lines = Main.runSearchSuggest(spark, store, "watermar lateness", k = 3)
    val wm = lines.filter(_.contains("\"probe\":\"watermar\""))
    assert(wm.nonEmpty && wm.head.contains("\"rnk\":1") &&
           wm.head.contains("\"term\":\"watermark\"") &&
           wm.head.contains("\"tf\":4"), lines.mkString("\n"))
    // an exact vocabulary hit is never suggested for itself —
    // "lateness" has no distance-1 neighbor in this store
    assert(!lines.exists(_.contains("\"term\":\"lateness\"")),
           lines.mkString("\n"))
  }

  test("snapshot/rollback: hardlink time travel — a bad ingest unwinds exactly; later snapshots survive") {
    val (in, store) = fixtureDirs()
    Main.runIngest(spark, in, store, "nomic", now)
    def state(): (Seq[(String, String)], Long, Long, Seq[String]) = (
      spark.read.parquet(s"$store/documents.parquet")
        .select("doc_id", "status").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted,
      spark.read.parquet(s"$store/chunks.parquet").count(),
      spark.read.parquet(s"$store/embeddings.parquet").count(),
      Main.runSearch(spark, store, "spark shuffle", "nomic", 3))
    val stateA = state()
    Main.main(Array("snapshot", store, "s1"))

    // a second batch: one new doc plus a near-dup that DEMOTES a
    // stored doc — the "bad ingest" to unwind
    val in2 = Files.createTempDirectory("graft_snap_in2").toFile
    Files.write(new java.io.File(in2, "zeta.txt").toPath,
      "a brand new document about watermark semantics".getBytes("UTF-8"))
    Files.write(new java.io.File(in2, "alpha_longer.txt").toPath,
      "# Spark\nspark query engine performance tuning guide with extra trailing words"
        .getBytes("UTF-8"))
    Main.runIngest(spark, in2.toString, store, "nomic",
                   java.sql.Timestamp.valueOf("2025-06-02 12:00:00"))
    val stateB = state()
    assert(stateB != stateA, "the second ingest must change the store")
    Main.main(Array("snapshot", store, "s2"))

    // rollback to s1: the live tree equals state A again, and fsck is
    // clean over the restored referential structure
    graft.io.Snapshots.restore(store, "s1")
    assert(state() == stateA, "rollback must restore the exact pre-ingest state")
    val (fsckLines, fsckViolations) = Main.runFsck(spark, store)
    assert(fsckViolations == 0L, fsckLines.mkString("\n"))
    // history is not rewritten: s2 still restores the later state
    graft.io.Snapshots.restore(store, "s2")
    assert(state() == stateB, "a later snapshot must survive a rollback")
    // snapshots are immutable
    intercept[IllegalArgumentException] {
      graft.io.Snapshots.create(store, "s1")
    }
    assert(graft.io.Snapshots.list(store) == Seq("s1", "s2"))
  }

  test("dupreport: a clean batch (zero candidates) reports zeros instead of crashing") {
    val in = Files.createTempDirectory("graft_dup_clean").toFile
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("a.txt", "completely unique first document with its own words")
    put("b.txt", "another entirely different text sharing no phrasing at all")
    val lines = Main.runDupReport(spark, in.toString)
    assert(lines == Seq(
      """{"docs":2,"linked_docs":0,"edges":0,"triangles":0,"clique_docs":0}"""),
      lines.mkString("\n"))
  }

  test("get/embeddings: document details and embedding inventory by id; unknown ids fail loudly") {
    val (in, store) = fixtureDirs()
    Main.runIngest(spark, in, store, "nomic", now)
    val docId = spark.read.parquet(s"$store/documents.parquet")
      .filter(col("status") === "completed")
      .select("doc_id").as[String].head()
    val got = Main.runGet(spark, store, docId)
    assert(got.head.contains(s""""doc_id":"$docId"""") &&
           got.head.contains("\"status\":\"completed\""), got.mkString("\n"))
    val nChunks = spark.read.parquet(s"$store/chunks.parquet")
      .filter(col("doc_id") === docId).count()
    assert(got.size.toLong == 1 + nChunks, got.mkString("\n"))
    // chunks arrive in order with their content
    assert(got(1).contains("\"chunk_number\":") && got(1).contains("\"content\":"))
    intercept[IllegalArgumentException] { Main.runGet(spark, store, "no-such-doc") }

    val embs = Main.runGetEmbeddings(spark, store, docId, Some("nomic"))
    assert(embs.size.toLong == nChunks, embs.mkString("\n"))
    assert(embs.forall(l => l.contains("\"provider\":\"nomic\"") &&
                            l.contains("\"dims\":")), embs.mkString("\n"))
    // an unknown provider yields empty (nothing stored), never a crash
    assert(Main.runGetEmbeddings(spark, store, docId, Some("nope")).isEmpty)
    // but an unknown DOC id fails loudly — empty must mean "no
    // embeddings stored", never "typo'd id"
    intercept[IllegalArgumentException] {
      Main.runGetEmbeddings(spark, store, "no-such-doc", None)
    }
  }

  test("metasearch: metadata-filtered text match; stored-postings and inline paths answer identically") {
    val (in, store) = fixtureDirs()
    Main.runIngest(spark, in, store, "nomic", now)
    // inline path first (no postings index yet)
    val inline = Main.runMetaSearch(spark, store, "spark engine", Map.empty)
    assert(inline.nonEmpty && inline.forall(_.contains("\"n_chunks\":")),
      inline.mkString("\n"))
    // the stored-postings path must answer identically
    Main.runBuildPostings(spark, store)
    assert(Main.runMetaSearch(spark, store, "spark engine", Map.empty) == inline,
      "stored-postings candidates must equal the inline scan")
    // a metadata filter narrows to the matching doc only
    val name = inline.head.split("\"filename\":\"")(1).split("\"")(0)
    val filtered = Main.runMetaSearch(spark, store, "spark engine",
                                      Map("filename" -> name))
    assert(filtered.size == 1 && filtered.head.contains(name),
      filtered.mkString("\n"))
    // a mismatching filter returns empty, not everything
    assert(Main.runMetaSearch(spark, store, "spark engine",
                              Map("content_type" -> "video/mp4")).isEmpty)
    // a typo'd filter column fails loudly, never widens
    intercept[IllegalArgumentException] {
      Main.runMetaSearch(spark, store, "spark engine", Map("filenme" -> name))
    }
    // a repeated filter column is a contradiction, not last-one-wins
    intercept[IllegalArgumentException] {
      Main.main(Array("metasearch", store, "spark engine",
                      "content_type=text/plain", "content_type=text/markdown"))
    }
    // the stored path must serve candidates without scanning the
    // chunks table: doc ids come off the chunk_id prefix — asserted on
    // the PRODUCTION dataflow, not a rebuilt copy
    val plan = Main.metaSearchHits(spark, store, "spark engine")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("chunks.parquet"),
      s"stored metasearch candidates must not scan the chunks table: $plan")
  }

  test("train/score: the boost model persists as a store artifact; score serves the stored model bit-identically") {
    val (in, store) = fixtureDirs()
    Main.runIngest(spark, in, store, "nomic", now)
    // score before train fails loudly — inference never silently retrains
    intercept[RuntimeException] { Main.runScoreModel(spark, store) }
    val trace = Main.runTrainModel(spark, store, rounds = 2)
    assert(trace.size == 2 && trace.head.contains("\"round\":1") &&
           trace.forall(_.contains("\"p0\":")), trace.mkString("\n"))
    assert(new java.io.File(store, "model_boost.parquet").isDirectory)
    val lines = Main.runScoreModel(spark, store)
    assert(lines.nonEmpty && lines.forall(_.contains("\"pred\":")),
      lines.mkString("\n"))
    // stored-model serving ≡ a fresh inline train over the same store
    val feats = spark.read.parquet(s"$store/chunks.parquet").select(
      col("chunk_number").cast("long").as("chunk_number"),
      col("total_chunks").cast("long").as("total_chunks"),
      length(col("content")).cast("long").as("n_chars"))
    val inline = graft.learn.Learn.boostFittedValues(
        feats, Seq("chunk_number", "total_chunks"), "n_chars", rounds = 2)
      .orderBy(col("chunk_number"), col("total_chunks"))
      .collect().toSeq.map(r =>
        s"""{"chunk_number":${r.getLong(0)},"total_chunks":${r.getLong(1)},""" +
          s""""n_rows":${r.getLong(2)},"pred":${r.getLong(3)},"sse":${r.getLong(4)}}""")
    assert(lines == inline, s"stored ≡ inline:\n$lines\nvs\n$inline")
    // artifact-writer crash between aside-rename and commit: the only
    // model copy sits in .trash — the reader preamble restores it
    val live = new java.io.File(store, "model_boost.parquet")
    val trash = new java.io.File(store, "model_boost.parquet.trash")
    assert(live.renameTo(trash))
    assert(Main.runScoreModel(spark, store) == lines)
    assert(live.exists() && !trash.exists())
  }

  test("interrupted snapshot restore: fsck rolls a park-without-relink crash forward; a marker-less park parks back") {
    val (in, store) = fixtureDirs()
    Main.runIngest(spark, in, store, "nomic", now)
    def state(): (Seq[(String, String)], Long, Seq[String]) = (
      spark.read.parquet(s"$store/documents.parquet")
        .select("doc_id", "status").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted,
      spark.read.parquet(s"$store/chunks.parquet").count(),
      Main.runSearch(spark, store, "spark shuffle", "nomic", 3))
    val stateA = state()
    Main.main(Array("snapshot", store, "s1"))
    val in2 = Files.createTempDirectory("graft_crash_in2").toFile
    Files.write(new java.io.File(in2, "zeta.txt").toPath,
      "a brand new document about watermark semantics".getBytes("UTF-8"))
    Main.runIngest(spark, in2.toString, store, "nomic",
                   java.sql.Timestamp.valueOf("2025-06-02 12:00:00"))
    val stateB = state()
    assert(stateB != stateA)

    // manufacture the exact crash state restore(s1) leaves if killed
    // between park and relink: intent marker written, every live entry
    // parked, NOTHING relinked — the live tree is empty
    def isTransient(n: String): Boolean =
      n == ".snapshots" || n == ".rollback_trash" ||
        n.endsWith(".lock") || n.endsWith(".lock.guard") ||
        n.endsWith(".tmp") || n.endsWith(".trash")
    def park(marker: Option[String]): Unit = {
      val root = new java.io.File(store)
      val trash = new java.io.File(root, ".rollback_trash")
      graft.io.Tables.rmTree(trash)
      Files.createDirectories(trash.toPath)
      marker.foreach { m =>
        Files.write(new java.io.File(trash, "_restore_from").toPath,
                    m.getBytes("UTF-8"))
      }
      root.listFiles().filterNot(e => isTransient(e.getName)).foreach { e =>
        assert(e.renameTo(new java.io.File(trash, e.getName)))
      }
    }
    park(Some("s1"))
    assert(!new java.io.File(store, "documents.parquet").exists(),
      "crash state: live tree must be empty")
    // next fsck converges: completes the restore to s1, audits clean
    val (lines, nViol) = Main.runFsck(spark, store)
    assert(lines.head.contains("interrupted_restore_converged") &&
           lines.head.contains("completed interrupted restore from snapshot s1"),
      lines.mkString("\n"))
    assert(nViol == 0L, lines.mkString("\n"))
    assert(state() == stateA, "fsck must converge the store to snapshot s1")
    assert(!new java.io.File(store, ".rollback_trash").exists())
    // idempotent: a second fsck reports nothing to converge
    val (lines2, _) = Main.runFsck(spark, store)
    assert(!lines2.exists(_.contains("interrupted_restore_converged")))

    // crash shape 2: parked state with NO intent marker (unknown
    // direction) — recovery must park BACK, restoring the pre-crash
    // live tree (stateA here), never leaving the store empty
    park(None)
    val (lines3, nViol3) = Main.runFsck(spark, store)
    assert(lines3.head.contains("parked interrupted rollback state back"),
      lines3.mkString("\n"))
    assert(nViol3 == 0L && state() == stateA, lines3.mkString("\n"))

    // crash shape 3: killed MID-relink — marker present, one entry
    // already relinked, the rest still parked; snapshot ops themselves
    // (create) converge before acting, so history never freezes a
    // half-relinked tree
    park(Some("s1"))
    val snapDocs = new java.io.File(store, ".snapshots/s1/documents.parquet")
    val live = new java.io.File(store, "documents.parquet")
    Files.createDirectories(live.toPath)
    snapDocs.listFiles().take(1).foreach { f =>
      Files.createLink(new java.io.File(live, f.getName).toPath, f.toPath)
    }
    Main.main(Array("snapshot", store, "s3"))
    assert(state() == stateA, "create must converge the crash state first")
    graft.io.Snapshots.restore(store, "s3")
    assert(state() == stateA, "s3 must hold the CONVERGED tree, not the partial one")
  }

  test("snapshot names are validated everywhere: a path-traversal name cannot touch the store") {
    val (in, store) = fixtureDirs()
    Main.runIngest(spark, in, store, "nomic", now)
    Main.main(Array("snapshot", store, "ok"))
    val docsBefore = spark.read.parquet(s"$store/documents.parquet").count()
    // ".." would resolve .snapshots/.. to the store root itself
    intercept[IllegalArgumentException] { graft.io.Snapshots.drop(store, "..") }
    intercept[IllegalArgumentException] { graft.io.Snapshots.restore(store, "..") }
    intercept[IllegalArgumentException] { graft.io.Snapshots.create(store, "../x") }
    assert(spark.read.parquet(s"$store/documents.parquet").count() == docsBefore)
    assert(graft.io.Snapshots.list(store) == Seq("ok"))
  }

  test("a snapshot's hardlinked vector-index sidecar survives a later writeMeta (replace, never truncate)") {
    import graft.search.VectorIndex
    val dir = Files.createTempDirectory("graft_meta_im").toString
    val idx = s"$dir/vector.idx"
    val meta = VectorIndex.Meta("nomic", m = 8, dims = 64, nlist = 4,
      codebookK = 16, samplePct = 100, rounds = 2,
      centroids = Seq((0L, Seq.fill(64)(1L))),
      codebooks = Seq((0L, Seq.fill(8)(1L))))
    VectorIndex.writeMeta(idx, meta)
    val live = new java.io.File(idx, "_graft_vector_meta.json")
    val linked = new java.io.File(dir, "snap_meta.json")
    java.nio.file.Files.createLink(linked.toPath, live.toPath)
    val before = java.nio.file.Files.readAllBytes(linked.toPath)
    // maintenance rewrites the sidecar of the LIVE index
    VectorIndex.writeMeta(idx, meta.copy(nlist = 8,
      centroids = Seq((0L, Seq.fill(64)(1L)), (1L, Seq.fill(64)(2L)))))
    assert(java.nio.file.Files.readAllBytes(linked.toPath)
             .sameElements(before),
           "the snapshot's hardlink must keep the OLD bytes")
    assert(VectorIndex.readMeta(idx).nlist == 8, "the live sidecar must update")
  }

  test("exportwds: every kept doc ships its original bytes + converted text as webdataset tar shards") {
    val (in, store) = fixtureDirs()
    Main.runIngest(spark, in, store, "nomic", now)
    val out = Files.createTempDirectory("graft_wds_out").toString
    val lines = Main.runExportWds(spark, store, out, nShards = 2)
    assert(lines.nonEmpty, "at least one shard")
    // read every shard back
    val entries = new java.io.File(out).listFiles().toSeq
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
      .flatMap(f => graft.io.Wds.readTar(
        java.nio.file.Files.readAllBytes(f.toPath)))
    val byName = entries.toMap
    val kept = spark.read.parquet(s"$store/documents.parquet")
      .filter(!col("status").isin("failed", "duplicate"))
      .select(col("doc_id"), col("content_type"),
              unbase64(col("content_b64")).as("bytes"))
      .collect()
    assert(kept.nonEmpty)
    kept.foreach { r =>
      val id = r.getAs[String]("doc_id")
      val ext = r.getAs[String]("content_type") match {
        case "application/pdf" => "pdf"
        case "image/png" => "png"
        case ct if ct.startsWith("text/") => "raw"
        case _ => "bin" // docx sniffs as application/zip
      }
      val payload = byName.getOrElse(s"$id.$ext",
        fail(s"missing payload member $id.$ext in ${byName.keys.toSeq.sorted}"))
      assert(payload.sameElements(r.getAs[Array[Byte]]("bytes")),
             s"payload bytes must be the store's original for $id")
      assert(byName.contains(s"$id.json"), s"missing $id.json")
    }
    // a text doc's converted-text member matches the converter
    val md = kept.find(_.getAs[String]("content_type") == "text/plain").get
    val mdId = md.getAs[String]("doc_id")
    val expectText = graft.ingest.Ingest.convertDocuments(
        spark.read.parquet(s"$store/documents.parquet")
          .filter(col("doc_id") === mdId))
      .select(col("text")).collect().head.getString(0)
    assert(new String(byName(s"$mdId.txt"), "UTF-8") == expectText)
    // the demoted near-dup never ships
    val demoted = spark.read.parquet(s"$store/documents.parquet")
      .filter(col("status") === "duplicate").select("doc_id")
      .collect().map(_.getString(0))
    demoted.foreach { id =>
      assert(!byName.keys.exists(_.startsWith(id)), s"demoted $id must not ship")
    }
  }

  test("search --bm25: identical answers before and after the postings index exists; the index actually serves") {
    val in = Files.createTempDirectory("graft_bm25_in").toFile
    val store = Files.createTempDirectory("graft_bm25_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("a.txt", "stream window stream window lateness marker")
    put("b.txt", "stream processing with one window only")
    put("c.txt", "cooking recipe with butter and flour")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    val scanned = Main.runSearchBm25(spark, store, "stream window", k = 5)
    assert(scanned.nonEmpty && scanned.head.contains("lateness marker"),
           scanned.mkString("\n"))
    assert(!scanned.exists(_.contains("cooking")), scanned.mkString("\n"))
    // build the index: serving flips to the stored path (norms present)
    // and the answers must not move
    Main.runBuildPostings(spark, store)
    assert(Search.postingsServesBm25(s"$store/postings.idx"))
    assert(Main.runSearchBm25(spark, store, "stream window", k = 5) == scanned)
  }

  test("dupreport: preflight triage names the template clique and its hubs before any ingest") {
    val in = Files.createTempDirectory("graft_dup_in").toFile
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    // a 3-doc template clique: the same boilerplate with one unique
    // token each (byte-distinct so content-keyed ids can't merge)
    val boiler = "quarterly report generated by the standard template " +
      "engine with identical header and footer blocks throughout"
    put("t1.txt", s"$boiler alpha")
    put("t2.txt", s"$boiler bravo")
    put("t3.txt", s"$boiler carol")
    // an unrelated pair sharing their own phrasing, and a loner
    put("p1.txt", "completely different cooking recipe with butter flour sugar eggs and a pinch of salt for baking")
    put("p2.txt", "completely different cooking recipe with butter flour sugar eggs and a spoon of salt for baking")
    put("u1.txt", "nothing here resembles anything else in this batch at all whatsoever")
    val lines = Main.runDupReport(spark, in.toString, topK = 3)
    // summary: 6 docs, the clique's 3 + the pair's 2 linked, 4 edges
    // (3 clique + 1 pair), ONE triangle, all 3 clique docs at 1000‰
    assert(lines.head ==
      """{"docs":6,"linked_docs":5,"edges":4,"triangles":1,"clique_docs":3}""",
      lines.mkString("\n"))
    // hubs: the clique members (deg 2, coefficient 1000‰) outrank the
    // pair (deg 1) under PageRank on this topology
    val hubs = lines.tail
    assert(hubs.size == 3, lines.mkString("\n"))
    hubs.foreach { h =>
      assert(h.contains("\"deg\":2") && h.contains("\"tri_cnt\":1") &&
             h.contains("\"cc_pm\":1000"), h)
    }
  }

  test("fsck: a fresh store audits clean; planted corruption is counted exactly") {
    val in = Files.createTempDirectory("graft_fsck_in").toFile
    val store = Files.createTempDirectory("graft_fsck_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("a.txt", "the quick brown fox jumps over the lazy dog and runs home")
    put("b.txt", "completely unrelated cooking recipe with butter and flour today")
    put("c.txt", "distributed shuffle partitioning strategies for spark at scale")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    Main.runBuildPostings(spark, store)
    Main.runBuildVectorIndex(spark, store, "nomic", nlist = 2)

    // fresh store: zero violations AND zero drift — every count is 0
    val (lines1, v1) = Main.runFsck(spark, store)
    assert(v1 === 0, lines1.mkString("\n"))
    assert(lines1.init.forall(_.contains("\"count\":0")), lines1.mkString("\n"))
    def count(lines: Seq[String], check: String): Long =
      lines.find(_.contains(s""""check":"$check"""")).map(l =>
        """"count":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong)
        .getOrElse(fail(s"$check missing: ${lines.mkString("\n")}"))

    // plant: an orphan chunk (doc_id with no document row), an orphan
    // embedding (chunk_id with no chunk row), and a doc flipped to
    // 'duplicate' WITHOUT its prune (the crash the swap commit is
    // supposed to rule out)
    val chunksPath = s"$store/chunks.parquet"
    spark.read.parquet(chunksPath).limit(1)
      .withColumn("doc_id", lit("ghost-doc"))
      .withColumn("chunk_id", lit("ghost-chunk"))
      .write.mode("append").parquet(chunksPath)
    val embPath = s"$store/embeddings.parquet"
    spark.read.parquet(embPath).limit(1)
      .withColumn("chunk_id", lit("ghost-emb"))
      .write.mode("append").parquet(embPath)
    val docsPath = s"$store/documents.parquet"
    val victim = spark.read.parquet(docsPath)
      .filter($"filename" === "a.md").select($"doc_id").as[String].head()
    val patched = spark.read.parquet(docsPath).localCheckpoint(true)
      .withColumn("status",
        when($"doc_id" === victim, lit("duplicate")).otherwise($"status"))
    patched.write.mode("overwrite").parquet(docsPath)

    val (lines2, v2) = Main.runFsck(spark, store)
    assert(count(lines2, "chunks_orphaned") === 1, lines2.mkString("\n"))
    assert(count(lines2, "embeddings_orphaned") === 1, lines2.mkString("\n"))
    val deadChunks = count(lines2, "chunks_of_dead_docs")
    val deadSigs = count(lines2, "signatures_of_dead_docs")
    assert(deadChunks >= 1 && deadSigs >= 1, lines2.mkString("\n"))
    assert(v2 === 2 + deadChunks + deadSigs, lines2.mkString("\n"))
    // the orphan embedding (provider nomic) surfaces as vector-index
    // DRIFT — the self-healing tier, counted but never a violation
    assert(count(lines2, "vector_index_missing") === 1, lines2.mkString("\n"))
    // the ghost chunk shows as embedding-coverage drift, not a violation
    assert(count(lines2, "chunks_without_embedding") >= 1, lines2.mkString("\n"))

    // --repair prunes exactly the unreachable rows and nothing else;
    // afterwards fsck is violation-free and only self-healing drift
    // remains (the demoted doc's vector stays in the index until the
    // next ingest reconcile)
    val repairs = Main.runFsckRepair(spark, store)
    def pruned(t: String): Long =
      repairs.find(_.contains(s""""table":"$t"""")).map(l =>
        """"pruned":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong)
        .getOrElse(fail(s"$t missing: ${repairs.mkString("\n")}"))
    assert(pruned("chunks") === 1 + deadChunks, repairs.mkString("\n"))
    assert(pruned("embeddings") === 1 + deadChunks, repairs.mkString("\n"))
    assert(pruned("signatures") === deadSigs, repairs.mkString("\n"))
    val (lines3, v3) = Main.runFsck(spark, store)
    assert(v3 === 0, lines3.mkString("\n"))
    assert(count(lines3, "vector_index_stale") === deadChunks,
           lines3.mkString("\n"))
    assert(count(lines3, "vector_index_missing") === 0, lines3.mkString("\n"))
  }

  test("tokenizer: trained merges persist as a store artifact and govern export/pack token counts") {
    val in = Files.createTempDirectory("graft_tok_in").toFile
    val store = Files.createTempDirectory("graft_tok_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    // repetitive vocabulary so training has real pairs to merge
    put("a.txt", "the spark engine sparks sparkly spark pipelines in the sparkpit")
    put("b.txt", "sparking sparks spark the spark sparkpit sparkly")
    Main.runIngest(spark, in.toString, store, "nomic", now)

    // pre-training: the manifest names the lexer proxy
    val out1 = Files.createTempDirectory("graft_tok_out1").toString
    val m1 = Main.runCurate(spark, store, out1, "nomic")
    assert(m1.contains("\"tokenizer\":\"bpe-lexer\""), m1)
    val lex = spark.read.json(out1)
      .select($"chunk_id", $"n_tokens").as[(String, Long)].collect().toMap

    val nMerges = Main.runTrainTokenizer(spark, store, rounds = 4)
    assert(nMerges >= 1)
    val mergesF = new java.io.File(store, "tokenizer.parquet")
    assert(mergesF.exists(), "tokenizer must persist as a store artifact")

    val out2 = Files.createTempDirectory("graft_tok_out2").toString
    val m2 = Main.runCurate(spark, store, out2, "nomic", packBudget = Some(64))
    assert(m2.contains("\"tokenizer\":\"stored-bpe\""), m2)
    val bpe = spark.read.json(out2)
      .select($"chunk_id", $"n_tokens", $"content", $"seq_no")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getString(2)))).toMap

    // char-level symbols minus a few merges: counts exceed the word
    // proxy on every multi-char-word chunk
    assert(bpe.keySet === lex.keySet)
    assert(bpe.forall { case (id, (n, _)) => n >= lex(id) },
           "trained counts are char-level minus merges, never below words")
    assert(bpe.exists { case (id, (n, _)) => n > lex(id) },
           "at least one chunk must count differently under the trained tokenizer")

    // independent replay: re-apply the stored merge list with a plain
    // Scala greedy fold and the per-chunk counts must match exactly
    val merges = spark.read.parquet(mergesF.toString)
      .orderBy($"round").select($"lft", $"rgt")
      .as[(String, String)].collect().toSeq
    def applyMerges(word: String): Int =
      merges.foldLeft(word.map(_.toString).toList) { case (syms, (l, r)) =>
        syms.foldLeft(List.empty[String]) { (acc, s) =>
          if (acc.nonEmpty && acc.last == l && s == r)
            acc.init :+ (l + r)
          else acc :+ s
        }
      }.size
    bpe.foreach { case (id, (n, content)) =>
      val expected = content.toLowerCase.split("\\W+").filter(_.nonEmpty)
        .map(applyMerges).sum
      assert(n === expected, s"chunk $id: stored-bpe count $n != replay $expected")
    }
  }

  test("watch: the streaming drain builds the same served store the batch path does") {
    val in = Files.createTempDirectory("graft_watch_in").toFile
    val store = Files.createTempDirectory("graft_watch_store").toString
    Files.write(new java.io.File(in, "a.md").toPath,
      "spark query engine performance tuning guide".getBytes("UTF-8"))
    Files.write(new java.io.File(in, "b.txt").toPath,
      "unrelated cooking recipe with butter and flour".getBytes("UTF-8"))
    val n = Main.runWatch(spark, in.toString, store)
    assert(n === 2)
    // the drained store serves like a batch-ingested one
    val hits = Main.runSearch(spark, store, "spark query engine", "nomic", 1)
    assert(hits.size === 1 && hits.head.contains("spark query engine"), hits.toString)
    // a second drain is exactly-once: nothing re-ingests
    assert(Main.runWatch(spark, in.toString, store) === 2)
  }

  test("compact: fragmented artifacts collapse to fewer files; every probe is unchanged") {
    val in = Files.createTempDirectory("graft_compact_in").toFile
    val store = Files.createTempDirectory("graft_compact_store").toString
    def put(name: String, text: String): Unit =
      Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    put("a.txt", "the quick brown fox jumps over the lazy dog and runs home")
    put("b.txt", "completely unrelated cooking recipe with butter and flour today")
    Main.runIngest(spark, in.toString, store, "nomic", now)
    Main.runBuildPostings(spark, store)
    Main.runBuildVectorIndex(spark, store, "nomic", nlist = 2)
    // a second batch fragments: postings append + index reconcile add
    // part files beside the originals
    put("c.txt", "distributed shuffle partitioning strategies for spark clusters")
    Main.runIngest(spark, in.toString, store, "nomic",
                   Timestamp.from(now.toInstant.plusMillis(10)))

    val phraseBefore = Main.runPhrase(spark, store, "cooking recipe")
    val annBefore = Main.runSearchAnn(spark, store, "shuffle partitioning", 3, 8)
    val docsBefore = spark.read.parquet(s"$store/documents.parquet").count()

    val reports = Main.runCompact(spark, store)
    def nums(l: String): (String, Long, Long) = {
      val t = """"table":"([^"]+)"""".r.findFirstMatchIn(l).get.group(1)
      val b = """"files_before":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong
      val a = """"files_after":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong
      (t, b, a)
    }
    val parsed = reports.map(nums)
    assert(parsed.exists(_._1 == "postings.idx"), reports.mkString("\n"))
    assert(parsed.forall { case (_, b, a) => a <= b }, reports.mkString("\n"))
    // the appended postings/jobs really were fragmented and collapsed
    assert(parsed.filter(p => p._1 == "postings.idx" || p._1 == "jobs")
      .exists { case (_, b, a) => a < b }, reports.mkString("\n"))

    // probes and counts identical through the rewrite
    assert(spark.read.parquet(s"$store/documents.parquet").count() === docsBefore)
    assert(Main.runPhrase(spark, store, "cooking recipe") === phraseBefore)
    assert(Main.runSearchAnn(spark, store, "shuffle partitioning", 3, 8) === annBefore)
    val (fsckLines, v) = Main.runFsck(spark, store)
    assert(v === 0, fsckLines.mkString("\n"))
  }
}
