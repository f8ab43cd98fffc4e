package graft

import org.apache.spark.sql.functions._

import graft.chunk.Chunkers
import graft.chunk.Chunkers.{ChunkerConfig, Strategy}
import graft.embed.Embedding

/** The 100 TB storage posture, demonstrated: chunks and embeddings
  * written bucketed by chunk_id make the embedding-cache probe (J1,
  * SURVEY §4.1) a ZERO-SHUFFLE join — each bucket pair joins in place.
  * On a 1000-executor cluster this is the difference between an
  * all-to-all of the whole embedding store and a local merge per
  * bucket.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed chunks ⋈ embeddings: no shuffle exchange in the join plan") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet").limit(100)
    val chunks = Chunkers.chunkDocuments(docs, "doc_id", "text",
        ChunkerConfig(strategy = Strategy.FixedWidth))
      .withColumn("chunk_id",
        concat(col("doc_id").cast("string"), lit("_"), col("chunk_id")))
    val emb = Embedding.embedChunks(chunks, "nomic").toDF()

    chunks.write.mode("overwrite")
      .bucketBy(8, "chunk_id").sortBy("chunk_id")
      .saveAsTable("chunks_bucketed")
    emb.write.mode("overwrite")
      .bucketBy(8, "chunk_id").sortBy("chunk_id")
      .saveAsTable("embeddings_bucketed")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("chunks_bucketed")
        .join(spark.table("embeddings_bucketed"), Seq("chunk_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(3000))
      assert(joined.count() == spark.table("chunks_bucketed").count())

      // the anti-join cache probe (J1) is equally shuffle-free
      val misses = spark.table("chunks_bucketed")
        .join(spark.table("embeddings_bucketed"), Seq("chunk_id"), "left_anti")
      assert(!misses.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(misses.count() == 0) // everything embedded
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
