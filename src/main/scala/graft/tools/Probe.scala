package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextStats

/** Throwaway perf probe for stage-level attribution (not part of the
  * driver surface).
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

    // q23 stages
    val filtered = docs.filter(col("source").isin("src0", "src1"))
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
    time("q23:buckets") {
      val sh = filtered
        .select(col("source").as("blk"), col("doc_id").as("doc"),
                TextStats.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("blk"), col("doc"),
                array_distinct(Dedup.shinglesOf(col("toks"), 3)).as("sh"))
      val withN = sh.select(col("blk"), col("doc"), col("sh"), size(col("sh")).as("n"))
      withN.select(col("blk"), explode(col("sh")).as("g"),
                   struct(col("doc"), col("n")).as("m"))
        .groupBy(col("blk"), col("g"))
        .agg(count(lit(1)).as("c")).filter(col("c").between(2, 20)).count()
    }
    time("q23:full") {
      Dedup.ngramJaccardPairs(filtered, "doc_id", "text", "source", dfCap = 20)
        .filter(col("inter") * 2 >= col("uni")).count()
    }

    // split: materialize sh, then time the bucket agg alone
    val shMat = filtered
      .select(col("source").as("blk"), col("doc_id").as("doc"),
              TextStats.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("blk"), col("doc"),
              array_distinct(Dedup.shinglesOf(col("toks"), 3)).as("sh"))
      .persist()
    shMat.count()
    time("q23:bucketsFromCached") {
      shMat.select(col("blk"), explode(col("sh")).as("g"),
                   struct(col("doc"), size(col("sh")).as("n")).as("m"))
        .groupBy(col("blk"), col("g"))
        .agg(count(lit(1)).as("c")).filter(col("c").between(2, 20)).count()
    }
    time("q23:pairsFromCached") {
      val withN = shMat.select(col("blk"), col("doc"), col("sh"), size(col("sh")).as("n"))
      val buckets = withN
        .select(col("blk"), explode(col("sh")).as("g"),
                struct(col("doc"), col("n")).as("m"))
        .groupBy(col("blk"), col("g"))
        .agg(sort_array(collect_list(col("m"))).as("ds"))
        .filter(size(col("ds")).between(2, 20))
      buckets
        .withColumn("__pair", explode(flatten(transform(col("ds"),
          a => transform(filter(col("ds"), b => b > a),
                         b => struct(a.as("a"), b.as("b")))))))
        .groupBy(col("__pair.a.doc").as("a_id"), col("__pair.b.doc").as("b_id"))
        .agg(count(lit(1)).as("inter"),
             first(col("__pair.a.n")).as("na"), first(col("__pair.b.n")).as("nb"))
        .count()
    }
    shMat.unpersist()

    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      println("===== q23 buckets plan =====")
      val sh = filtered
        .select(col("source").as("blk"), col("doc_id").as("doc"),
                TextStats.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("blk"), col("doc"),
                array_distinct(Dedup.shinglesOf(col("toks"), 3)).as("sh"))
      val withN = sh.select(col("blk"), col("doc"), col("sh"), size(col("sh")).as("n"))
      withN.select(col("blk"), explode(col("sh")).as("g"),
                   struct(col("doc"), col("n")).as("m"))
        .groupBy(col("blk"), col("g"))
        .agg(count(lit(1)).as("c")).filter(col("c").between(2, 20))
        .explain("formatted")
    }

    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      println("===== q41 full plan =====")
      val sig = Dedup.simhashSignatures(docs, "doc_id", "text",
          keepCols = Seq("source"), bits = 32)
        .withColumnRenamed("simhash", "sh")
      Dedup.simhashPairs(sig, "doc_id", "sh", "source", bits = 32, maxHamming = 3)
        .explain("formatted")
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
    locally {
      val sigMat = Dedup.simhashSignatures(docs, "doc_id", "text",
          keepCols = Seq("source"), bits = 32)
        .withColumnRenamed("simhash", "sh").persist()
      sigMat.count()
      val chunked = sigMat.select(col("source").as("blk"), col("doc_id").as("doc"),
          col("sh").as("sig"),
          posexplode(array((0 until 4).map(c =>
            shiftright(col("sh"), c * 8).bitwiseAND(255L)): _*)).as(Seq("cid", "cval")))
      val a = chunked.select(col("blk"), col("cid"), col("cval"),
                             col("doc").as("a_id"), col("sig").as("sa"))
      val b = chunked.select(col("blk"), col("cid"), col("cval"),
                             col("doc").as("b_id"), col("sig").as("sb"))
      time("q41:candidates") {
        a.join(b, Seq("blk", "cid", "cval")).filter(col("a_id") < col("b_id")).count()
      }
      time("q41:distinctPairs") {
        a.join(b, Seq("blk", "cid", "cval")).filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"), col("sa"), col("sb")).distinct().count()
      }
      time("q41:fromCachedFull") {
        Dedup.simhashPairs(sigMat, "doc_id", "sh", "source",
                           bits = 32, maxHamming = 3).count()
      }
      sigMat.unpersist()
      val sig2 = Dedup.simhashSignatures(docs, "doc_id", "text",
          keepCols = Seq("source"), bits = 32)
        .withColumnRenamed("simhash", "sh")
      val chunked2 = sig2.select(col("source").as("blk"), col("doc_id").as("doc"),
          col("sh").as("sig"),
          posexplode(array((0 until 4).map(c =>
            shiftright(col("sh"), c * 8).bitwiseAND(255L)): _*)).as(Seq("cid", "cval")))
      val a2 = chunked2.select(col("blk"), col("cid"), col("cval"),
                               col("doc").as("a_id"), col("sig").as("sa"))
      val b2 = chunked2.select(col("blk"), col("cid"), col("cval"),
                               col("doc").as("b_id"), col("sig").as("sb"))
      time("q41:shuffleJoinFull") {
        a2.hint("shuffle_hash").join(b2.hint("shuffle_hash"), Seq("blk", "cid", "cval"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"), col("sa"), col("sb")).distinct()
          .withColumn("hamming", Dedup.hamming(col("sa"), col("sb")).cast("long"))
          .filter(col("hamming") <= 3).count()
      }
    }
    spark.stop()
  }
}
