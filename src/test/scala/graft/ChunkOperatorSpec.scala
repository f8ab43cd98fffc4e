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

  test("fixed-width native branch ≡ the Scala chunker, and plans no UDF") {
    val texts: Seq[(Long, String)] = Seq(
      0L -> null, 1L -> "", 2L -> "a", 3L -> "x" * 99, 4L -> "y" * 100,
      5L -> "z" * 101, 6L -> ("h\u00e9llo w\u00f6rld! " * 23),
      7L -> ("ab\ncd " * 50),
      // astral plane: 150 surrogate-pair code points — both the native
      // substr branch and the Scala chunker must slice by CODE POINTS
      // (3 chunks of 100+50), the reference's Python semantics
      8L -> ("\ud83d\ude00" * 150))
    val cfg = ChunkerConfig(strategy = Strategy.FixedWidth)
    val got = Chunkers.chunkDocuments(texts.toDF("doc_id", "text"),
                                      "doc_id", "text", cfg)
      .select($"doc_id", $"chunk_number", $"content", $"total_chunks",
              $"strategy", $"is_fallback", $"chunk_type")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3),
                 r.getString(4), r.getBoolean(5), r.getString(6)))
      .sortBy(t => (t._1, t._2))
    val expected = texts.flatMap { case (id, t) =>
      val (cs, strategy, fb) = Chunkers.chunk(Option(t).getOrElse(""), cfg)
      cs.zipWithIndex.map { case (c, i) =>
        (id, i + 1, c.text, cs.size, strategy, fb,
         if (fb) "full_document" else "fixed_chunk")
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expected, s"native branch diverges:\n${got.toSeq.take(6)}")
    val plan = Chunkers.chunkDocuments(texts.toDF("doc_id", "text"),
                                       "doc_id", "text", cfg)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("),
           s"fixed-width must stay codegen-native:\n${plan.take(2000)}")
  }
}
