package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.chunk.Chunkers
import graft.chunk.Chunkers.{ChunkerConfig, Strategy}
import graft.embed.Embedding
import graft.ingest.Ingest
import graft.io.Tables
import graft.search.Search

/** The reference's end-to-end contract, mirrored step for step
  * (solaius/data_pipeline2 `test_full_pipeline.py:9-154`): upload →
  * document stored pending → processed into chunks with complete
  * metadata → embeddings generated per provider → vector store holds
  * one embedding per (chunk, provider) → provider-filtered similarity
  * search returns score-ordered hits.
  */
class FullPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("upload → chunk → embed (both providers) → store → search, like test_full_pipeline.py") {
    // -- upload (test_full_pipeline.py:54-74): files → pending documents
    val dir = Files.createTempDirectory("graft_e2e").toFile
    Files.writeString(new java.io.File(dir, "doc1.txt").toPath,
      "# Machine Learning\n\nNeural networks learn representations. " +
      "Transformers changed NLP. Attention is the key mechanism.")
    Files.writeString(new java.io.File(dir, "doc2.md").toPath,
      "# Databases\n\nQuery engines optimize plans. " +
      "Columnar storage speeds scans. Joins need good statistics.")
    val now = lit(Timestamp.valueOf("2025-06-01 00:00:00"))
    val docs = Ingest.toDocuments(Ingest.readBinaryDir(spark, dir.getAbsolutePath), now)
    assert(docs.count() == 2)
    assert(docs.filter($"status" === "pending").count() == 2) // stored PENDING first
    assert(docs.filter($"filename" === "doc1.md").count() == 1) // .txt→.md rewrite

    // -- process (test_full_pipeline.py:34-51): chunks with metadata
    val text = docs.select($"doc_id", Ingest.decodeContent($"content_b64").as("text"))
    val chunks = Chunkers.chunkDocuments(text, "doc_id", "text",
        ChunkerConfig(chunkSize = 80, strategy = Strategy.Sentence))
      .withColumn("chunk_id", concat($"doc_id", lit("_"), $"chunk_id"))
    val chunkRows = chunks.collect()
    assert(chunkRows.nonEmpty)
    chunkRows.foreach { r => // metadata completeness (:62-74)
      assert(r.getAs[String]("content").nonEmpty)
      assert(r.getAs[Int]("chunk_number") >= 1)
      assert(r.getAs[Int]("chunk_number") <= r.getAs[Int]("total_chunks"))
      assert(r.getAs[String]("chunk_type") == "sentence_chunk")
    }
    // heading context reaches chunks (sentence chunker: last heading quirk)
    assert(chunkRows.forall(_.getAs[Seq[String]]("headings").nonEmpty))

    // -- document status transitions to completed after processing
    val docsDone = Tables.upsert(
      docs,
      docs.withColumn("status", lit("completed"))
          .withColumn("updated_at", lit(Timestamp.valueOf("2025-06-01 00:05:00"))),
      Seq("doc_id"), Seq(col("updated_at")))
    assert(docsDone.filter($"status" === "completed").count() == 2)

    // -- embeddings per provider (test_full_pipeline.py:76-106)
    val nomic = Embedding.embedChunks(chunks, "nomic").toDF()
    val granite = Embedding.embedChunks(chunks, "granite").toDF()
    val store = nomic.unionByName(granite)
    val nChunks = chunks.count()
    assert(store.count() == nChunks * 2)
    // exactly one embedding per (chunk, provider), 768-dim (:108-139)
    assert(store.groupBy("chunk_id", "embedding_provider").count()
      .filter($"count" =!= 1).count() == 0)
    assert(store.filter(size($"embedding") =!= Embedding.Dims).count() == 0)
    // the two providers produce different vectors for the same chunk
    val sameVec = nomic.alias("n").join(granite.alias("g"), "chunk_id")
      .filter($"n.embedding" === $"g.embedding").count()
    assert(sameVec == 0)

    // -- provider-filtered search, score-descending (:141-154)
    val qv = Embedding.embedQuery("neural attention transformers", "nomic")
    val hits = Search.knn(store, qv.toSeq, k = 3, provider = Some("nomic"),
                          tieBreak = Seq($"chunk_id")).collect()
    assert(hits.nonEmpty && hits.length <= 3)
    val scores = hits.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_: Double)), "hits must be score-descending")
    assert(hits.forall(_.getAs[String]("embedding_provider") == "nomic"))
    // the ML doc's chunks outrank the database doc's for an ML query
    val mlDoc = text.filter($"text".contains("Neural")).select("doc_id").head().getString(0)
    assert(hits.head.getAs[String]("chunk_id").startsWith(mlDoc))
  }
}
