package graft

import graft.dedup.Dedup

/** Blocked fuzzy near-dup by edit distance (q124). */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)],
                  maxEdits: Int = 6, maxBlock: Int = 1000) =
    Dedup.fuzzyNearDup(rows.toDF("doc_id", "text"), "doc_id", "text",
                       maxEdits = maxEdits, maxBlock = maxBlock)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Long)].collect().toSeq

  test("typo'd twins pair with the exact edit count; unrelated docs don't") {
    val rows = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "The quick brewn fox jumps over the lazy dog"), // 1 substitution
      (3L, "A completely different sentence about databases"),
      (4L, "The quirky brown fox leaps over seventeen turtles"))
    val got = run(rows)
    // normalized keys: doc 1/2 differ by 1 edit inside 32 chars; doc 4
    // shares the 'thequi' block but diverges past maxEdits; doc 3 is in
    // another block entirely
    assert(got == Seq((1L, 2L, 1L)))
  }

  test("pairs never cross blocks even when globally close") {
    // one leading edit changes the block: blocked linkage misses it BY
    // DESIGN (documented trade-off; the shingle family covers it)
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "galpha beta gamma delta epsilon"))
    assert(run(rows).isEmpty)
  }

  test("length pre-filter and threshold: edits > maxEdits drop") {
    val rows = Seq(
      (1L, "mmmmmm aaaaaaaaaaaaaaaaaaaaa"),
      (2L, "mmmmmm bbbbbbbbbbbbbbbbbbbbb"))
    // same block 'mmmmmm', same length, but 21 substitutions
    assert(run(rows).isEmpty)
    assert(run(rows, maxEdits = 26) == Seq((1L, 2L, 21L)))
  }

  test("hot blocks are df-capped; short/empty normalized keys are excluded") {
    val hot = (1L to 20L).map(i => (i, s"prefix shared by all $i"))
    val tiny = Seq((100L, "ab"), (101L, "ba"), (102L, "!!! ??? ..."))
    assert(run(hot ++ tiny, maxBlock = 10).isEmpty)
    assert(run(tiny).isEmpty) // keys shorter than blockLen never pair
  }

  test("plan: one block equi-join, levenshtein after the length gate, no cartesian") {
    val df = (1L to 30L).map(i => (i, s"common prefix text number $i"))
      .toDF("doc_id", "text")
    val plan = Dedup.fuzzyNearDup(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("UDF("), plan)
  }
}
