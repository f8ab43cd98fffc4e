package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.io.Tables
import graft.jobs.JobLedger
import graft.search.Search

class LedgerSearchWinnowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("pointLookup returns at most one row with the filter pushed down (S7)") {
    val df = spark.read.parquet(s"$Sf001/documents.parquet")
    val got = Tables.pointLookup(df, "doc_id", 7L)
    assert(got.count() == 1)
    assert(got.queryExecution.executedPlan.toString.contains("PushedFilters"),
           "lookup filter must reach the scan")
  }

  test("ledger: applyTransitions + status + progressReport over a job table (ST4/ST5/A6)") {
    import graft.Schemas.{JobStatus, JobType}
    val j = JobLedger.newJob("j1", JobType.DocumentProcessing, ts("2025-01-01 00:00:00"),
                             totalItems = 10)
    val running = JobLedger.transition(j, JobStatus.Running, ts("2025-01-01 00:01:00"))
      .copy(processed_items = 5L, progress = 0.5)
    val ledger = Seq(j).toDS().toDF()
    val after = JobLedger.applyTransitions(ledger, Seq(running).toDS().toDF())
    assert(after.count() == 1) // latest wins
    val st = JobLedger.status(after, "j1").collect().head
    assert(st.getAs[String]("status") == "running")
    val pr = JobLedger.progressReport(after).collect().head
    assert(pr.getAs[Double]("progress_ratio") == 0.5)
  }

  test("cachedSearch: miss computes and keys; hit returns cached rows (Q4)") {
    val cacheT = Seq(("k_old", "r1")).toDF("cache_key", "result")
    var ran = 0
    val run = () => { ran += 1; Seq(("fresh", "r2")).toDF("ignored", "result").drop("ignored") }
    val (missRes, hit1) = Search.cachedSearch(cacheT, "k_new", run)
    assert(!hit1 && ran == 1)
    assert(missRes.columns.contains("cache_key"))
    val (hitRes, hit2) = Search.cachedSearch(cacheT, "k_old", run)
    assert(hit2 && ran == 1) // no recompute on hit
    assert(hitRes.select("result").as[String].collect().toSeq == Seq("r1"))
  }

  test("winnow: identical content shares every fingerprint; disjoint content shares none") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact dup
      (3L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text")
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fps(1L) == fps(2L))
    assert((fps(1L) intersect fps(3L)).isEmpty)
    // near-dup: one word changed at the end still shares a prefix run
    val edited = Seq((4L, "alpha beta gamma delta epsilon zeta eta theta iota OMEGA"))
      .toDF("doc_id", "text")
    val fps4 = Dedup.winnowFingerprints(docs.union(edited), "doc_id", "text")
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps4(1L) intersect fps4(4L)).nonEmpty, "edited doc must share prefix fingerprints")
  }

  test("Chunkers.bpeCount ≡ size(TextStats.bpeTokens) on gnarly words") {
    import graft.chunk.Chunkers
    import graft.text.TextStats
    val words = Seq("hello", "x9y", "can't", "a-b_c", "...", "café", "123abc456", "@@@")
    val viaCol = words.toDF("w")
      .select(size(TextStats.bpeTokens($"w"))).as[Int].collect().toSeq
    assert(words.map(Chunkers.bpeCount) == viaCol)
  }

  test("simhashSignatures (codegen bulk form) ≡ scalar simhash, incl. empty docs") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
      .select($"doc_id", $"text").limit(100)
      .union(Seq((-1L, ""), (-2L, "   "), (-3L, "one")).toDF("doc_id", "text"))
    Seq(16, 32).foreach { bits =>
      val scalar = docs.select($"doc_id", Dedup.simhash($"text", bits).as("sig"))
      val bulk = Dedup.simhashSignatures(docs, "doc_id", "text", bits = bits)
        .withColumnRenamed("simhash", "sig")
      assert(scalar.except(bulk).count() === 0 && bulk.except(scalar).count() === 0,
             s"forms diverge at bits=$bits")
    }
  }
}
