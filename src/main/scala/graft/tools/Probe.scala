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
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
              graft.GraftExtensions.ExcludedOptimizerRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
