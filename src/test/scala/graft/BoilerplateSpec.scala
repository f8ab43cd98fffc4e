package graft

import graft.text.TextStats

/** Boilerplate line removal (q68): shared template lines stripped,
  * content order preserved, all-boilerplate docs survive empty.
  */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  test("lines shared by more than dfCap docs are stripped; order survives") {
    val header = "ACME CORP — INTERNAL"
    val footer = "copyright 2025 acme"
    val docs = (1L to 5L).map { i =>
      (i, s"$header\nunique line a $i\nunique line b $i\n$footer")
    } :+ ((6L, s"$header\n$footer")) // all boilerplate
    val got = TextStats.stripBoilerplate(docs.toDF("doc_id", "text"),
                                         "doc_id", "text", dfCap = 3)
      .select($"doc_id", $"n_lines", $"n_kept", $"clean")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)

    got.take(5).zipWithIndex.foreach { case ((id, nl, nk, clean), idx) =>
      val i = idx + 1
      assert(nl == 4 && nk == 2, s"doc $id: expected 2 of 4 lines kept")
      assert(clean == s"unique line a $i\nunique line b $i",
             s"doc $id: content order must survive the rebuild")
    }
    assert(got(5) == ((6L, 2L, 0L, "")), "all-boilerplate doc survives empty")
  }

  test("hot-line anti-join broadcasts (corpus side never shuffles for it)") {
    val plan = SparkEntry.queries("q68_strip_boilerplate")(spark, Sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
           plan.take(3000))
  }

  test("empty lines are structural separators, never boilerplate") {
    // every doc shares the blank line (df=5 > cap=3) — a hot-set that
    // counted blanks would strip every paragraph boundary in the corpus
    val docs = (1L to 5L).map(i => (i, s"para a $i\n\npara b $i")).toDF("doc_id", "text")
    val got = TextStats.stripBoilerplate(docs, "doc_id", "text", dfCap = 3)
      .select($"doc_id", $"clean").as[(Long, String)].collect().toMap
    (1L to 5L).foreach { i =>
      assert(got(i) == s"para a $i\n\npara b $i",
             "blank lines must survive so \\n\\n paragraph structure does")
    }
  }

  test("below the cap nothing is stripped") {
    val docs = Seq((1L, "x\ny"), (2L, "x\nz")).toDF("doc_id", "text")
    val got = TextStats.stripBoilerplate(docs, "doc_id", "text", dfCap = 3)
      .select($"doc_id", $"clean").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "x\ny", 2L -> "x\nz"))
  }
}
