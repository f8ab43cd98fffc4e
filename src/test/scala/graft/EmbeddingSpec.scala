package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.embed.Embedding

/** Ports the reference's embedding invariants
  * (solaius/data_pipeline2 `tests/test_embedding_service.py`).
  */
class EmbeddingSpec extends SparkSpec {
  import spark.implicits._

  test("providers are deterministic, normalized, and distinguishable") {
    val n = Embedding.provider("nomic").embedOne("hello world")
    val n2 = Embedding.provider("nomic").embedOne("hello world")
    val g = Embedding.provider("granite").embedOne("hello world")
    assert(n.sameElements(n2))
    assert(!n.sameElements(g)) // two providers differ (test_embedding_service.py:172-205)
    assert(n.length == Embedding.Dims)
    val norm = math.sqrt(n.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("unknown provider raises (test_embedding_service.py:125-131)") {
    assertThrows[IllegalArgumentException](Embedding.provider("bogus"))
  }

  test("retry: transient failures retried 3x then succeed (py:133-170)") {
    var calls = 0
    val flaky = new Embedding.EmbeddingProvider {
      def name = "flaky"; def modelName = "m"
      def embedOne(text: String): Array[Float] = {
        calls += 1
        if (calls < 2) throw new RuntimeException("transient")
        Array.fill(dims)(1.0f)
      }
    }
    var slept = Vector.empty[Long]
    val r = new Embedding.RetryingProvider(flaky, attempts = 3, sleep = t => slept :+= t)
    assert(r.embedOne("x").length == Embedding.Dims)
    assert(calls == 2 && slept.nonEmpty)
  }

  test("retry: exhausted attempts rethrow") {
    val dead = new Embedding.EmbeddingProvider {
      def name = "dead"; def modelName = "m"
      def embedOne(text: String): Array[Float] = throw new RuntimeException("down")
    }
    val r = new Embedding.RetryingProvider(dead, attempts = 3, sleep = _ => ())
    assertThrows[RuntimeException](r.embedOne("x"))
  }

  test("batch embed: all-failure yields empty result, no raise (py:108-123)") {
    val failing = Embedding.providers("nomic") // embed() catches per-text
    val res = failing.embed(Seq(null, null)) // null text → Option handling
    assert(res.forall(_.isDefined)) // hashing provider tolerates null → zero-vector path
  }

  test("embedChunks embeds every chunk with provider metadata") {
    val chunks = Seq(("c1", "hello world"), ("c2", "another text"))
      .toDF("chunk_id", "content")
    val out = Embedding.embedChunks(chunks, "nomic").collect()
    assert(out.length == 2)
    assert(out.forall(_.embedding_provider == "nomic"))
    assert(out.forall(_.model == "nomic-local-hash-768"))
    val local = Embedding.provider("nomic").embedOne("hello world")
    assert(out.find(_.chunk_id == "c1").get.embedding.sameElements(local))
  }

  test("embedChunksDistinct: content-memoized output equals the per-chunk embed") {
    val chunks = Seq(("c1", "shared content"), ("c2", "shared content"),
                     ("c3", "unique content"), ("c4", "shared content"),
                     ("c5", null))               // null content must not drop
      .toDF("chunk_id", "content")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("chunk_id"), r.getAs[String]("embedding_provider"),
       r.getSeq[Float](r.fieldIndex("embedding")).toList,
       r.getAs[String]("model"))
    val perChunk = Embedding.embedChunks(chunks, "nomic").toDF()
      .collect().map(key).sortBy(_._1)
    val memoized = Embedding.embedChunksDistinct(chunks, "nomic")
      .collect().map(key).sortBy(_._1)
    assert(memoized.toSeq == perChunk.toSeq,
           "memoized embed must be indistinguishable from per-chunk embed")
    assert(memoized.count(_._3 == memoized.head._3) == 3,
           "the three shared-content chunks carry the identical vector")
  }

  test("embedWithCache: hits reused, misses computed, TTL-expired recomputed (E6)") {
    val now = Timestamp.valueOf("2025-01-02 00:00:00")
    val fresh = Timestamp.valueOf("2025-01-01 12:00:00") // age 12h < 24h TTL
    val stale = Timestamp.valueOf("2024-12-30 00:00:00") // age 3d > TTL
    val cachedVec = Array.fill(Embedding.Dims)(9.9f)
    val existing = Seq(
      ("c1", "nomic", cachedVec, "nomic-local-hash-768", fresh),
      ("c2", "nomic", cachedVec, "nomic-local-hash-768", stale))
      .toDF("chunk_id", "embedding_provider", "embedding", "model", "created_at")
    val chunks = Seq(("c1", "text one"), ("c2", "text two"), ("c3", "text three"))
      .toDF("chunk_id", "content")
    val out = Embedding.embedWithCache(chunks, existing, "nomic", now = now)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](2)).toMap
    assert(out.keySet == Set("c1", "c2", "c3"))
    assert(out("c1").forall(_ == 9.9f))      // cache hit reused
    assert(!out("c2").forall(_ == 9.9f))     // stale → recomputed
    assert(out("c3") == Embedding.provider("nomic").embedOne("text three").toSeq)
  }
}
