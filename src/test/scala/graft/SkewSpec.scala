package graft

import org.apache.spark.sql.functions._

import graft.io.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted count/sum match direct aggregation on a skewed key") {
    // 90% of rows share one key — the classic hot-key shape
    val df = ((1 to 9000).map(i => ("hot", i.toLong)) ++
              (1 to 1000).map(i => (s"k${i % 50}", i.toLong)))
      .toDF("k", "v")
    val directCount = df.groupBy("k").count().as[(String, Long)].collect().toMap
    val saltedCount = Skew.saltedCount(df, "k", "v").as[(String, Long)].collect().toMap
    assert(saltedCount == directCount)
    val directSum = df.groupBy("k").agg(sum("v")).as[(String, Long)].collect().toMap
    val saltedSum = Skew.saltedSum(df, "k", "v", "v").as[(String, Long)].collect().toMap
    assert(saltedSum == directSum)
  }

  test("phase-1 groups spread a hot key over multiple salt buckets") {
    val df = (1 to 5000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val buckets = df.groupBy(col("k"), Skew.salt(col("v"), 16).as("s"))
      .count().filter($"k" === "hot").count()
    assert(buckets > 8, s"hot key only hit $buckets of 16 salt buckets")
  }
}
