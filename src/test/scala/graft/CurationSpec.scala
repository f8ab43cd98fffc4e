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

  // the spec-local log2fp twin (same recurrence as FixedPoint)
  private def log2fp(x0: Long): Long = {
    val x = math.max(x0, 1L)
    val e = (63 - java.lang.Long.numberOfLeadingZeros(x)).toLong
    var m = if (e > 20) x >> (e - 20) else x << (20 - e)
    var acc = 0L
    (1 to 12).foreach { _ =>
      val mp = (m * m) >> 20
      if (mp >= (1L << 21)) { acc = acc * 2 + 1; m = mp >> 1 }
      else { acc = acc * 2; m = mp }
    }
    e * 4096L + acc
  }

  private def uOf(salt: String, id: Long): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt|$id".getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString, 16) + 1

  test("weightedSample: exactly the A-ES driver twin, deterministic per salt") {
    val rows = (1L to 100L).map(i => (i, (i % 7 + 1) * 10))
    val df = rows.toDF("id", "wt")
    val got = Curation.weightedSample(df, "id", "wt", k = 10, salt = "s1")
      .as[(Long, Long, Long)].collect().toSeq
    val twin = rows.map { case (id, w) =>
      (id, w.toLong, ((log2fp(uOf("s1", id)) - 131072L) * 1000000L) / w) }
      .sortBy { case (id, _, key) => (-key, id) }.take(10)
    assert(got == twin)
    // same salt, same answer
    val again = Curation.weightedSample(df, "id", "wt", k = 10, salt = "s1")
      .as[(Long, Long, Long)].collect().toSeq
    assert(again == got)
  }

  test("weightedSample: heavier rows win proportionally more across salts") {
    // items 1-10 weight 1, items 11-20 weight 10; over 30 salts the
    // heavy half must dominate the k=5 picks
    val rows = (1L to 20L).map(i => (i, if (i <= 10) 1 else 10))
    val df = rows.toDF("id", "wt")
    val picks = (1 to 30).flatMap { s =>
      Curation.weightedSample(df, "id", "wt", k = 5, salt = s"salt$s")
        .as[(Long, Long, Long)].collect().map(_._1)
    }
    val heavy = picks.count(_ > 10L)
    assert(heavy > picks.size * 2 / 3,
           s"heavy items must dominate: $heavy of ${picks.size}")
    // both halves appear at least once — it is a sample, not a sort
    assert(picks.exists(_ <= 10L))
  }

  test("weightedSample plan: TakeOrderedAndProject, no corpus shuffle, no UDF") {
    val plan = Curation.weightedSample(
        spark.range(1000).toDF("id").withColumn("wt", $"id" % 9 + 1),
        "id", "wt", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("UDF("))
  }

  test("adaptiveQualityFilter: each source drops ITS OWN bottom quartile — same score, different fate") {
    import graft.text.Curation
    // source A: 8 docs, 8 tokens each, s=0..7 stopwords → scores 1250·s
    // source B: 8 docs, 16 tokens each, s=2..9 stopwords → scores 625·s
    def doc(src: String, s: Int, t: Int) =
      (s"${src}$s", src, (("the " * s) + ("zzz " * (t - s))).trim)
    val docs = ((0 to 7).map(s => doc("a", s, 8)) ++
                (2 to 9).map(s => doc("b", s, 16)))
      .toDF("doc_id", "source", "text")
    val got = Curation.adaptiveQualityFilter(docs, "doc_id", "text", "source")
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // per-source p25 (rank ceil(n/4) = 2 of 8): A → 1250, B → 1875
    assert(got("a0")._4 == 1250L && got("b2")._4 == 1875L,
           got.values.toSeq.sortBy(_._1).toString)
    // the SAME score 1250 is kept in A (at its cutoff) and dropped in
    // B (below its cutoff) — the reason the gate is per-source
    assert(got("a1")._3 == 1250L && got("a1")._5,
           s"A's 1250 doc must be kept: ${got("a1")}")
    assert(got("b2")._3 == 1250L && !got("b2")._5,
           s"B's 1250 doc must drop: ${got("b2")}")
    // exactly the strictly-below-cutoff docs drop
    assert(got.values.count(!_._5) == 2, got.values.filterNot(_._5).toString)
  }

  test("balancedSample keeps the cap smallest ids per group") {
    val rows = Seq((3L, "a"), (1L, "a"), (2L, "a"), (5L, "a"), (10L, "b"))
      .toDF("vec_id", "cell")
    val got = Curation.balancedSample(rows, "cell", "vec_id", cap = 2)
      .select($"cell", $"rk", $"vec_id").as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 1L, 10L)),
           got.mkString(", "))
  }

  test("balancedSample pushes the rank filter map-side (WindowGroupLimit)") {
    val plan = SparkEntry.queries("q156_balanced_sample")(spark, Sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }
}
