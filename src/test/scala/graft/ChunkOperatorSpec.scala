package graft

import org.apache.spark.sql.functions._

import graft.chunk.Chunkers
import graft.chunk.Chunkers.{ChunkerConfig, Strategy}

/** The distributed chunking operator (C6 enrichment + W1/W2 numbering)
  * over real driver data.
  */
class ChunkOperatorSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocuments: numbering is 1..total per doc, ids are chunk_{i}") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    val out = Chunkers.chunkDocuments(docs, "doc_id", "text",
      ChunkerConfig(chunkSize = 120, strategy = Strategy.Sentence))
    val bad = out.groupBy("doc_id")
      .agg(max($"chunk_number").as("mx"), count(lit(1)).as("n"),
           max($"total_chunks").as("tc"))
      .filter($"mx" =!= $"n" || $"tc" =!= $"n")
      .count()
    assert(bad == 0)
    val ids = out.filter($"chunk_number" === 1).select("chunk_id").distinct()
      .as[String].collect()
    assert(ids.toSeq == Seq("chunk_1"))
  }

  test("chunkDocuments: metadata completeness (test_chunking.py:149-160)") {
    val docs = Seq((1L, "One. Two. Three. Four. Five.")).toDF("doc_id", "text")
    val rows = Chunkers.chunkDocuments(docs, "doc_id", "text",
      ChunkerConfig(chunkSize = 10, chunkOverlap = 2, strategy = Strategy.Sentence)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("chunk_number") <= r.getAs[Int]("total_chunks"))
      assert(r.getAs[String]("chunk_type") == "sentence_chunk")
      assert(r.getAs[String]("strategy") == "sentence")
      assert(!r.getAs[Boolean]("is_fallback"))
    }
  }

  test("chunkDocuments: fallback row for unchunkable text") {
    val docs = Seq((1L, "no terminators at all")).toDF("doc_id", "text")
    val rows = Chunkers.chunkDocuments(docs, "doc_id", "text",
      ChunkerConfig(strategy = Strategy.Sentence)).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Boolean]("is_fallback"))
    assert(rows.head.getAs[String]("chunk_type") == "full_document")
    assert(rows.head.getAs[String]("content") == "no terminators at all")
  }

  test("chunking plan stays shuffle-free (no Exchange before write)") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    val out = Chunkers.chunkDocuments(docs, "doc_id", "text",
      ChunkerConfig(chunkSize = 120, strategy = Strategy.Markdown))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
