package graft

import graft.text.Curation

/** Corpus-curation sampling (q70/q71): per-group cap and stratified
  * deterministic sampling, plus the plan shapes that make them scale.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("capPerGroup keeps best `cap` rows per group with a total rank") {
    val docs = Seq(
      (1L, "a", 100L), (2L, "a", 300L), (3L, "a", 200L), (4L, "a", 300L),
      (5L, "b", 50L)).toDF("doc_id", "source", "n_chars")
    val got = Curation.capPerGroup(docs, "source", "doc_id", "n_chars", cap = 2)
      .select($"doc_id", $"source", $"rk").as[(Long, String, Long)]
      .collect().sortBy(r => (r._2, r._3))
    // ties on score (docs 2 and 4, both 300) break to the lower id
    assert(got.toSeq == Seq((2L, "a", 1L), (4L, "a", 2L), (5L, "b", 1L)))
  }

  test("capPerGroup pushes the rank filter map-side (WindowGroupLimit)") {
    val plan = SparkEntry.queries("q70_source_cap")(spark, Sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("stratified sample is per-stratum rate-bounded and deterministic") {
    val docs = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val kept = Curation.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 50, "de" -> 20), defaultRate = 10)
      .select($"doc_id", $"lang", $"bucket").as[(Long, String, Long)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // md5 buckets are near-uniform: expect ~500 en, ~200 de with slack
    assert(byLang("en") > 400 && byLang("en") < 600, byLang.toString)
    assert(byLang("de") > 140 && byLang("de") < 260, byLang.toString)
    assert(kept.forall { case (_, l, b) => b < (if (l == "en") 50 else 20) })
    // rerun yields the identical kept set (no rand() anywhere)
    val again = Curation.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 50, "de" -> 20), defaultRate = 10)
      .select($"doc_id").as[Long].collect()
    assert(again.sorted.toSeq == kept.map(_._1).sorted.toSeq)
  }

  test("temperature sampling: exact integer rates, biggest stratum keeps all") {
    val docs = ((1L to 900L).map(i => (i, "en")) ++ (901L to 1000L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    val kept = Curation.temperatureSample(docs, "doc_id", "lang")
      .select($"doc_id", $"lang", $"rate").as[(Long, String, Long)].collect()
    val rates = kept.map(r => r._2 -> r._3).toMap
    // en: floor(sqrt(10000*900 div 900)) = 100; de: floor(sqrt(1111)) = 33
    assert(rates == Map("en" -> 100L, "de" -> 33L), rates.toString)
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("en") == 900, "rate 100 keeps the whole largest stratum")
    assert(byLang("de") > 15 && byLang("de") < 50, byLang.toString)
  }

  test("temperature sampling joins the corpus against broadcast rates") {
    val plan = SparkEntry.queries("q75_temperature_sample")(spark, Sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("stratified sample plans as a scan-fused filter: no shuffle at all") {
    val plan = SparkEntry.queries("q71_stratified_sample")(spark, Sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
           "sampling must not shuffle: " + plan.take(3000))
  }

  test("trainingOrder: a permutation — every row once, pos contiguous per shard") {
    import spark.implicits._
    val df = (1L to 500L).toDF("id")
    val out = Curation.trainingOrder(df, "id", nShards = 8)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.map(_._1).sorted.toSeq === (1L to 500L))
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.size.toLong),
             s"shard $shard positions not contiguous")
    }
    // all shards populated and no shard hogs the corpus (md5 uniform)
    val sizes = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.size === 8)
    assert(sizes.values.max < 2 * sizes.values.min + 20, s"skewed: $sizes")
  }

  test("trainingOrder: deterministic across runs/partitionings; salt reseeds the epoch") {
    import spark.implicits._
    val df = (1L to 300L).toDF("id")
    def run(d: org.apache.spark.sql.DataFrame, salt: String) =
      Curation.trainingOrder(d, "id", 4, salt)
        .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
        .sortBy(_._1).toSeq
    val a = run(df.repartition(1), "ord")
    val b = run(df.repartition(16, org.apache.spark.sql.functions.col("id")), "ord")
    assert(a === b, "order must not depend on input partitioning")
    val epoch2 = run(df, "epoch2")
    assert(epoch2 !== a, "a new salt must give a different permutation")
  }

  test("trainingOrder plan: one shuffle keyed by shard, no global sort") {
    import spark.implicits._
    val plan = Curation.trainingOrder((1L to 100L).toDF("id"), "id", 8)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly one shuffle:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
           s"must not global-sort:\n$plan")
  }
}
