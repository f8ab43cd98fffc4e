package graft

import org.apache.spark.sql.functions._

import graft.text.Profile

/** Mergeable log2-histogram corpus profiler: first-principles quantile
  * recomputation, merge-order/partitioning invariance (the property
  * percentile_approx lacks), bounded sketch size, and a codegen-only
  * plan.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  // brute-force reference: the p-th quantile's log2-bin lower bound
  private def expected(lengths: Seq[Long], p: Int): Long = {
    def bin(v: Long) = 64 - java.lang.Long.numberOfLeadingZeros(math.max(v, 1L))
    val byBin = lengths.groupBy(bin).view.mapValues(_.size.toLong).toMap
    val n = lengths.size.toLong
    val b = byBin.keys.toSeq.sorted
      .scanLeft((0, 0L)) { case ((_, cum), k) => (k, cum + byBin(k)) }
      .find { case (_, cum) => cum * 100 >= n * p }.get._1
    1L << (b - 1)
  }

  test("quantile bounds match a brute-force recomputation") {
    val lengths = (1L to 100L) ++ Seq(1000L, 5000L, 9000L)
    val df = lengths.zipWithIndex
      .map { case (len, i) => (s"src${i % 2}", len) }.toDF("source", "len")
    val got = Profile.lengthProfile(df, "source", "len")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect()
    for ((src, n, p50, p90, p99) <- got) {
      val mine = lengths.zipWithIndex.collect {
        case (len, i) if s"src${i % 2}" == src => len
      }
      assert(n === mine.size)
      assert(p50 === expected(mine, 50), s"$src p50")
      assert(p90 === expected(mine, 90), s"$src p90")
      assert(p99 === expected(mine, 99), s"$src p99")
    }
  }

  test("zero/one-length docs land in the bottom bin, never error") {
    val df = Seq(("s", 0L), ("s", 1L), ("s", 1L)).toDF("source", "len")
    val row = Profile.lengthProfile(df, "source", "len")
      .as[(String, Long, Long, Long, Long)].head()
    assert(row === (("s", 3L, 1L, 1L, 1L)))
  }

  test("partitioning-invariant: any merge order gives the same sketch and quantiles") {
    val df = (1L to 997L).map(i => (s"src${i % 3}", (i * 131) % 7919 + 1)).toDF("source", "len")
    val a = Profile.lengthProfile(df.repartition(1), "source", "len")
      .orderBy("source").collect().toSeq
    val b = Profile.lengthProfile(df.repartition(32, col("len")), "source", "len")
      .orderBy("source").collect().toSeq
    assert(a === b)
  }

  test("sketch is bounded (<=64 bins per group) and the plan is UDF-free with map-side partial agg") {
    val df = (1L to 500L).map(i => (s"src${i % 4}", i)).toDF("source", "len")
    val hist = Profile.lengthHistogram(df, "source", "len")
    val maxBins = hist.groupBy("source").count().agg(max("count")).as[Long].head()
    assert(maxBins <= 64)
    val plan = Profile.lengthProfile(df, "source", "len")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("), "profiler must stay codegen column algebra")
    // the heavy input is reduced by a partial aggregate BEFORE its
    // exchange: at 100 TB the shuffle carries (group, bin) counts only
    assert(plan.contains("partial_count"), s"no map-side partial aggregation in:\n$plan")
  }

  // ---- distinct-count sketch ----

  /** Driver-side twin of the register construction. */
  private def refSketch(tokens: Seq[String]): (Long, Long) = {
    val regs = scala.collection.mutable.Map.empty[Long, Long]
    tokens.foreach { t =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(hex.take(2), 16)
      val v = java.lang.Long.parseLong(hex.slice(2, 10), 16)
      val rho = if (v == 0) 33L else 33L - (64 - java.lang.Long.numberOfLeadingZeros(v))
      regs(bucket) = math.max(regs.getOrElse(bucket, 0L), rho)
    }
    val dn = regs.values.map(m => (1L << 30) >> m).sum +
      (256 - regs.size) * (1L << 30)
    (regs.size.toLong, Profile.HllNum / dn / Profile.HllDen)
  }

  test("distinctSketch: estimate matches the driver-side register twin exactly") {
    val tokens = (1 to 20000).map(i => s"tok${i % 3000}")
    val df = tokens.map(t => ("s", t)).toDF("source", "tok")
    val row = Profile.distinctSketch(df, "source", "tok")
      .select("n_tokens", "registers_used", "est_distinct")
      .as[(Long, Long, Long)].head()
    val (regs, est) = refSketch(tokens)
    assert(row === ((20000L, regs, est)))
  }

  test("distinctSketch: estimate within HLL error of the true distinct count") {
    // 3000 distinct >> 2.5*m = 640, i.e. outside the raw-HLL
    // small-range bias regime; 1.04/sqrt(256) = 6.5% std error — 4
    // sigma of slack keeps this deterministic-input test meaningful
    // without flaking on the single fixed hash draw.
    val df = (1 to 20000).map(i => ("s", s"tok${i % 3000}")).toDF("source", "tok")
    val est = Profile.distinctSketch(df, "source", "tok")
      .select("est_distinct").as[Long].head()
    assert(math.abs(est - 3000.0) / 3000.0 < 0.26, s"est=$est truth=3000")
  }

  test("distinctSketch: merge-order-invariant and occurrence-count-invariant") {
    val df = (1 to 5000).map(i => ("s", s"tok${i % 1500}")).toDF("source", "tok")
    val a = Profile.distinctSketch(df.repartition(1), "source", "tok")
      .select("registers_used", "est_distinct").as[(Long, Long)].head()
    val b = Profile.distinctSketch(df.repartition(16, col("tok")), "source", "tok")
      .select("registers_used", "est_distinct").as[(Long, Long)].head()
    assert(a === b)
    // duplicating every occurrence changes n_tokens but NOT the sketch
    val c = Profile.distinctSketch(df.union(df), "source", "tok")
      .select("registers_used", "est_distinct").as[(Long, Long)].head()
    assert(c === a)
  }

  test("distinctSketch plan: UDF-free, register max partial-aggregated before the exchange") {
    val df = (1 to 100).map(i => ("s", s"t$i")).toDF("source", "tok")
    val plan = Profile.distinctSketch(df, "source", "tok")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("))
    assert(plan.contains("partial_max"), s"register max must combine map-side:\n$plan")
  }

  // ---- Count-Min sketch ----

  /** Driver-side twin of the CMS bucket/estimate construction. */
  private def cmsRef(tokens: Seq[String], probe: String): Long = {
    def bucket(j: Int, t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j|$t".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 1024
    }
    (0 until 4).map { j =>
      val b = bucket(j, probe)
      tokens.count(t => bucket(j, t) == b).toLong
    }.min
  }

  test("incremental fold: any batching of sketch states and histograms is bit-identical to one-shot") {
    val docs = (1L to 300L)
      .map(i => (s"s${i % 3}", s"tok${i % 41} tok${i % 67} word$i", (i * 7 % 500 + 1)))
      .toDF("source", "text", "n_chars")
    val toks = docs.select(col("source"),
      explode(split(col("text"), " ")).as("tok"))
    def report(state: org.apache.spark.sql.DataFrame) =
      Profile.sketchFromState(state, "source")
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
    val oneShot = report(Profile.sketchState(toks, "source", "tok"))
    // three disjoint batchings, folded LEFT-TO-RIGHT and in a permuted
    // order — the per-ingest read-merge-rewrite loop in miniature
    val parts = (0 to 2).map(b =>
      Profile.sketchState(
        toks.filter(graft.dedup.Dedup.hashBucket(col("tok"), 3) === b),
        "source", "tok"))
    assert(report(Profile.mergeSketchStates("source", parts: _*)) == oneShot)
    assert(report(Profile.mergeSketchStates("source",
      Profile.mergeSketchStates("source", parts(2), parts(0)), parts(1))) == oneShot)
    // histograms: additive counts, same law; quantiles identical
    def quants(h: org.apache.spark.sql.DataFrame) =
      Profile.histogramQuantiles(h, "source", Seq(50, 90, 99))
        .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    val oneHist = quants(Profile.lengthHistogram(docs, "source", "n_chars"))
    val hParts = (0 to 2).map(b =>
      Profile.lengthHistogram(docs.filter(col("n_chars") % 3 === b),
                              "source", "n_chars"))
    assert(quants(Profile.mergeHistograms("source", hParts(1), hParts(2), hParts(0)))
             == oneHist)
    // the state stays register-bounded through any number of merges
    assert(Profile.mergeSketchStates("source", parts: _*)
      .groupBy("source").count().as[(String, Long)].collect()
      .forall(_._2 <= 256L))
    // third law: CMS counters add — the folded sketch estimates
    // bit-identically to the one-shot sketch on every probe
    val tokOnly = toks.select(col("tok").as("token"))
    val probes = tokOnly.groupBy("token").agg(count(lit(1)).as("true_cnt"))
    def est(sketch: org.apache.spark.sql.DataFrame) =
      Profile.cmsEstimate(sketch, probes, "token")
        .as[(String, Long, Long)].collect().sorted.toSeq
    val cmsParts = (0 to 2).map(b =>
      Profile.cmsSketch(
        tokOnly.filter(graft.dedup.Dedup.hashBucket(col("token"), 3) === b),
        "token"))
    assert(est(Profile.mergeCmsSketches(cmsParts(2), cmsParts(0), cmsParts(1)))
             == est(Profile.cmsSketch(tokOnly, "token")))
  }

  test("subtractive fold: removing a batch's delta is bit-identical to never folding it; registers serve without occ") {
    val docs = (1L to 300L)
      .map(i => (s"s${i % 3}", s"tok${i % 41} tok${i % 67} word$i", (i * 7 % 500 + 1)))
      .toDF("source", "text", "n_chars")
    val b2 = col("n_chars") % 3 === 2
    // histogram: fold ALL, subtract batch 2's delta, drop zero rows →
    // exactly the histogram of the corpus that never held batch 2
    def quants(h: org.apache.spark.sql.DataFrame) =
      Profile.histogramQuantiles(h, "source", Seq(50, 90, 99))
        .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    val subtracted = Profile.mergeHistograms("source",
        Profile.lengthHistogram(docs, "source", "n_chars"),
        Profile.lengthHistogram(docs.filter(b2), "source", "n_chars")
          .withColumn("cnt", -col("cnt")))
      .filter(col("cnt") =!= 0L)
    assert(quants(subtracted) ==
           quants(Profile.lengthHistogram(docs.filter(!b2), "source", "n_chars")))
    // same law for CMS counters, probed on the remaining corpus
    val toks = docs.select(col("source"),
      explode(split(col("text"), " ")).as("token"))
    val remTok = docs.filter(!b2).select(col("source"),
      explode(split(col("text"), " ")).as("token"))
    val probes = remTok.groupBy("token").agg(count(lit(1)).as("true_cnt"))
    def est(sk: org.apache.spark.sql.DataFrame) =
      Profile.cmsEstimate(sk, probes, "token")
        .as[(String, Long, Long)].collect().sorted.toSeq
    val subCms = Profile.mergeCmsSketches(
        Profile.cmsSketch(toks.select(col("token")), "token"),
        Profile.cmsSketch(
          docs.filter(b2).select(col("source"),
            explode(split(col("text"), " ")).as("token"))
            .select(col("token")), "token")
          .withColumn("cnt", -col("cnt")))
      .filter(col("cnt") =!= 0L)
    assert(est(subCms) == est(Profile.cmsSketch(remTok.select(col("token")), "token")))
    // the registers-only serving (no occ — the product profile's form)
    // agrees with sketchFromState on est_distinct and registers_used
    val state = Profile.sketchState(toks.withColumnRenamed("token", "tok"),
                                    "source", "tok")
    val full = Profile.sketchFromState(state, "source")
      .select(col("source"), col("registers_used"), col("est_distinct"))
      .as[(String, Long, Long)].collect().sorted.toSeq
    val regsOnly = Profile.distinctFromRegisters(state, "source")
      .select(col("source"), col("registers_used"), col("est_distinct"))
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(regsOnly == full)
  }

  test("sketchOverlap: union on registers IS the sketch of the concatenated data — exact") {
    // the HLL mergeability theorem, checked bit-for-bit: est_union of
    // (a, b) equals est_distinct of a++b re-sketched from scratch
    val ta = (1 to 4000).map(i => ("a", s"tok${i % 900}"))
    val tb = (1 to 4000).map(i => ("b", s"alt${i % 700}"))
    val regs = Profile.hllRegisters((ta ++ tb).toDF("source", "tok"),
                                    "source", "tok")
    val got = Profile.sketchOverlap(regs, "source")
      .select("g_a", "g_b", "est_union").as[(String, String, Long)].head()
    val whole = Profile.distinctSketch(
        (ta ++ tb).map { case (_, t) => ("u", t) }.toDF("source", "tok"),
        "source", "tok")
      .select("est_distinct").as[Long].head()
    assert(got == (("a", "b", whole)))
  }

  test("sketchOverlap: identical groups overlap fully — intersection = singles, jaccard 1000") {
    val toks = (1 to 3000).map(i => s"tok${i % 800}")
    val df = (toks.map(("x", _)) ++ toks.map(("y", _))).toDF("source", "tok")
    val row = Profile.sketchOverlap(Profile.hllRegisters(df, "source", "tok"),
                                    "source")
      .as[(String, String, Long, Long, Long, Long, Long)].head()
    val (ga, gb, ea, eb, eu, ei, j) = row
    assert((ga, gb) == (("x", "y")))
    assert(ea == eb && eu == ea && ei == ea && j == 1000L, row.toString)
  }

  test("sketchOverlap: near-disjoint vocabularies report a small clamped intersection") {
    val df = ((1 to 5000).map(i => ("a", s"left${i % 1200}")) ++
              (1 to 5000).map(i => ("b", s"right${i % 1200}"))).toDF("source", "tok")
    val row = Profile.sketchOverlap(Profile.hllRegisters(df, "source", "tok"),
                                    "source")
      .as[(String, String, Long, Long, Long, Long, Long)].head()
    val (_, _, ea, eb, eu, ei, j) = row
    assert(ei >= 0L && eu <= ea + eb, row.toString)
    // truly disjoint sets: intersection estimate stays inside sketch
    // noise — far below either single cardinality
    assert(ei < ea / 4 && ei < eb / 4, row.toString)
    assert(j < 250L, row.toString)
  }

  test("sketchOverlap plan: no cartesian product, no UDF; pairs via register equi-join") {
    val df = ((1 to 200).map(i => ("a", s"t$i")) ++
              (1 to 200).map(i => ("b", s"t${i + 100}"))).toDF("source", "tok")
    val plan = Profile.sketchOverlap(Profile.hllRegisters(df, "source", "tok"),
                                     "source")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("UDF("), plan)
  }

  test("cumulativeDistinct: every prefix equals re-sketching it from scratch; truth rides beside") {
    // day 2 repeats day 1 exactly (no new information), day 3 adds a
    // disjoint key set — the curve must be flat through day 2 and the
    // per-day values must equal independent sketches of each prefix
    val d1 = (1 to 800).map(i => (1, s"u$i"))
    val d2 = (1 to 800).map(i => (2, s"u$i"))
    val d3 = (1 to 400).map(i => (3, s"w$i"))
    val got = Profile.cumulativeDistinct((d1 ++ d2 ++ d3).toDF("day", "uid"),
                                         "day", "uid")
      .orderBy("day").as[(Int, Long, Long, Long)].collect().toSeq
    def sk(rows: Seq[(Int, String)]): (Long, Long) = Profile.distinctSketch(
        rows.map { case (_, u) => ("g", u) }.toDF("g", "uid"), "g", "uid")
      .select("registers_used", "est_distinct").as[(Long, Long)].head()
    val p1 = sk(d1); val p2 = sk(d1 ++ d2); val p3 = sk(d1 ++ d2 ++ d3)
    assert(got == Seq((1, p1._1, p1._2, 800L),
                      (2, p2._1, p2._2, 800L),
                      (3, p3._1, p3._2, 1200L)), got.toString)
  }

  test("rollingDistinct: each day's window equals re-sketching its union; a calendar gap ages keys out") {
    def d(s: String) = java.sql.Date.valueOf(s)
    // days 1, 2, then a gap to day 9: the 7-day window at day 9 covers
    // days 3..9 — only day 9's own keys remain
    val day1 = (1 to 400).map(i => (d("2025-01-01"), s"u$i"))
    val day2 = (200 to 600).map(i => (d("2025-01-02"), s"u$i"))
    val day9 = (1 to 300).map(i => (d("2025-01-09"), s"w$i"))
    val got = Profile.rollingDistinct(
        (day1 ++ day2 ++ day9).toDF("day", "uid"), "day", "uid",
        windowDays = 7)
      .orderBy("day")
      .as[(java.sql.Date, Long, Long, Long)].collect().toSeq
    def sk(rows: Seq[(java.sql.Date, String)]): (Long, Long) =
      Profile.distinctSketch(
          rows.map { case (_, u) => ("g", u) }.toDF("g", "uid"), "g", "uid")
        .select("registers_used", "est_distinct").as[(Long, Long)].head()
    val w1 = sk(day1); val w2 = sk(day1 ++ day2); val w9 = sk(day9)
    assert(got == Seq(
      (d("2025-01-01"), w1._1, w1._2, 400L),
      (d("2025-01-02"), w2._1, w2._2, 600L),
      (d("2025-01-09"), w9._1, w9._2, 300L)), got.toString)
  }

  test("cmsSketch estimates match the driver twin and never under-count") {
    val tokens = (1 to 8000).map(i => s"tok${i % 700}") ++ (1 to 500).map(_ => "hot")
    val df = tokens.map(Tuple1(_)).toDF("tok")
    val sketch = Profile.cmsSketch(df, "tok")
    val truth = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probes = truth.keys.toSeq.sorted.take(50) :+ "hot"
    val est = Profile.cmsEstimate(
        sketch, probes.map(Tuple1(_)).toDF("tok"), "tok")
      .as[(String, Long)].collect().toMap
    probes.foreach { p =>
      assert(est(p) === cmsRef(tokens, p), s"probe $p")
      assert(est(p) >= truth(p), s"CMS under-counted $p")
    }
    // an unseen token estimates low (bounded by collision mass), never negative
    val unseen = Profile.cmsEstimate(
        sketch, Seq(Tuple1("never-seen-token")).toDF("tok"), "tok")
      .as[(String, Long)].head()._2
    assert(unseen >= 0)
  }

  test("cmsSketch: counters add — merge/partitioning-invariant") {
    val df = (1 to 5000).map(i => Tuple1(s"tok${i % 300}")).toDF("tok")
    def sk(d: org.apache.spark.sql.DataFrame) =
      Profile.cmsSketch(d, "tok").orderBy("j", "bucket")
        .as[(Int, Long, Long)].collect().toSeq
    assert(sk(df.repartition(1)) === sk(df.repartition(16, col("tok"))))
  }

  test("cmsJoinSizeEstimate: driver twin exact, one-sided vs the true join size") {
    import graft.text.Profile
    def bucket(j: Int, t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j|$t".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 1024
    }
    val rnd = new scala.util.Random(5)
    val as = (1 to 300).map(_ => s"k${rnd.nextInt(80)}")
    val bs = (1 to 500).map(_ => s"k${rnd.nextInt(120)}")
    val est = Profile.cmsJoinSizeEstimate(
        Profile.cmsSketch(as.toDF("k"), "k"),
        Profile.cmsSketch(bs.toDF("k"), "k"))
      .as[Long].collect().head
    // driver twin: min over rows of the bucket-count inner product
    val twin = (0 until 4).map { j =>
      val ca = as.groupBy(t => bucket(j, t)).map { case (b, g) => b -> g.size.toLong }
      val cb = bs.groupBy(t => bucket(j, t)).map { case (b, g) => b -> g.size.toLong }
      ca.map { case (b, c) => c * cb.getOrElse(b, 0L) }.sum
    }.min
    assert(est == twin)
    // one-sided: never below the true inner-product join size
    val ta = as.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tb = bs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truth = ta.map { case (k, c) => c * tb.getOrElse(k, 0L) }.sum
    assert(est >= truth, s"CMS join estimate must never under-count: $est < $truth")
  }

  test("cmsSketch plan: map-side partial count; probe joins a broadcast sketch") {
    val df = (1 to 200).map(i => Tuple1(s"t${i % 40}")).toDF("tok")
    val sketch = Profile.cmsSketch(df, "tok")
    val skPlan = sketch.queryExecution.executedPlan.toString
    assert(skPlan.contains("partial_count"), s"no map-side combine:\n$skPlan")
    val probePlan = Profile.cmsEstimate(sketch, df.limit(5), "tok")
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("BroadcastHashJoin"),
           s"probe must join the broadcast sketch:\n$probePlan")
  }
  test("cmsJoinSizeEstimate: no-collision rows zero-fill — disjoint keys give 0, never NULL") {
    import graft.text.Profile
    def bucket(j: Int, t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j|$t".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 1024
    }
    val as = Seq("left_only_a", "left_only_b")
    val bs = Seq("right_only_a", "right_only_b")
    val est = Profile.cmsJoinSizeEstimate(
        Profile.cmsSketch(as.toDF("k"), "k"),
        Profile.cmsSketch(bs.toDF("k"), "k"))
      .as[Option[Long]].collect().toSeq
    // twin WITH zero-fill: a row whose buckets never collide contributes
    // 0 to the min (the old inner-join form dropped it, returning NULL
    // here and inflating the min whenever only some rows overlapped)
    val twin = (0 until 4).map { j =>
      val ca = as.groupBy(t => bucket(j, t)).map { case (b, g) => b -> g.size.toLong }
      val cb = bs.groupBy(t => bucket(j, t)).map { case (b, g) => b -> g.size.toLong }
      ca.map { case (b, c) => c * cb.getOrElse(b, 0L) }.sum
    }.min
    assert(est == Seq(Some(twin)))
    assert(twin == 0L, "fixture should have at least one collision-free row")
  }

}
