package graft

import graft.search.Ann

/** Filtered vector search (q113): the pre-filter exact path and the
  * IVF post-filter path with nprobe escalation.
  */
class FilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters: cluster A (ids 0-9, label 0 except 2 odd ones),
  // cluster B (ids 10-19, label 1)
  private val a = Seq(10f, 0f, 0f, 10f)
  private val b = Seq(0f, 10f, 10f, 0f)
  private def jittered(base: Seq[Float], i: Int) =
    base.map(_ + (i % 9) * 0.001f)
  private val rows = (0 until 20).map { i =>
    val label = if (i >= 10) 1 else if (i % 5 == 4) 1 else 0
    (i.toLong, jittered(if (i < 10) a else b, i), label)
  }
  private val df = rows.toDF("vec_id", "embedding", "label")

  test("pre-filter exact path equals brute force over the sliver") {
    val got = Ann.filteredTopKInt(df, "vec_id", "embedding",
                                  $"label" === 0, a, k = 3)
      .as[(Long, Long)].collect().toSeq
    // brute twin
    val qi = a.map(Ann.quantizeL)
    val twin = rows.filter(_._3 == 0)
      .map { case (id, v, _) =>
        (id, v.map(Ann.quantizeL).zip(qi).map { case (x, y) => x * y }.sum) }
      .sortBy { case (id, d) => (-d, id) }.take(3)
    assert(got == twin)
    assert(got.forall(r => rows(r._1.toInt)._3 == 0))
  }

  test("post-filter probe returns only predicate survivors from probed cells") {
    val cents = Seq(0L -> a.map(Ann.quantizeL), 1L -> b.map(Ann.quantizeL))
    val assigned = Ann.ivfAssignInt(df, "embedding", cents)
    val got = Ann.ivfFilteredTopKInt(assigned, "vec_id", "embedding",
                                     $"label" === 1, cents, a,
                                     k = 2, nprobe = 1)
      .as[(Long, Long, Long)].collect().toSeq
    // nprobe=1 probes cluster A's cell; A's label-1 members are 4 and 9
    assert(got.map(_._1).toSet == Set(4L, 9L), got.toString)
  }

  test("a starved filter escalates nprobe instead of returning short") {
    val cents = Seq(0L -> a.map(Ann.quantizeL), 1L -> b.map(Ann.quantizeL))
    val assigned = Ann.ivfAssignInt(df, "embedding", cents)
    // k=5 label-1 matches: only 2 live in the probed near cell; the
    // escalation must widen to the second cell and find 5
    val got = Ann.ivfFilteredTopKInt(assigned, "vec_id", "embedding",
                                     $"label" === 1, cents, a,
                                     k = 5, nprobe = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == 5, s"escalation must refill k: $got")
    assert(got.map(_._1).toSet.subsetOf(rows.filter(_._3 == 1).map(_._1).toSet))
    // the near cell's matches still rank first (higher dot to the query)
    assert(got.take(2).map(_._1).toSet == Set(4L, 9L), got.toString)
  }

  test("plan: the pre-filter predicate reaches the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fann").toString
    df.write.mode("overwrite").parquet(s"$dir/e.parquet")
    val stored = spark.read.parquet(s"$dir/e.parquet")
    val plan = Ann.filteredTopKInt(stored, "vec_id", "embedding",
                                   $"label" === 0, a, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
           plan.replaceAll("\\s", "").contains("EqualTo(label,0)"),
           s"label predicate must push to the parquet scan: $plan")
    assert(!plan.contains("UDF("))
  }
}
