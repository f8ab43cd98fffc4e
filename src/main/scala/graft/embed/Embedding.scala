package graft.embed

import java.sql.Timestamp
import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Schemas.EmbeddingRow

/** Embedding operators (reference E1–E7, SURVEY.md §2.10).
  *
  * Provider shape mirrors solaius/data_pipeline2
  * `services/embedding_service.py:33-122` (base provider + nomic/granite
  * subclasses overriding request format). This environment is
  * zero-egress, so providers are deterministic local implementations —
  * a seeded hashing-trick projection to 768 dims — behind the same
  * trait, preserving the registry (`embedding_service.py:126-137`), the
  * batch size contract (:197-198, default 32), the retry contract
  * (:45-50), and the failure-skip semantics (:206-212).
  *
  * Distribution model (100 TB posture): embedding runs inside
  * `mapPartitions` — per-partition batches of 32, no shuffle, no driver
  * involvement; the asyncio fan-out of the reference (:199-204) maps to
  * Spark task parallelism across partitions.
  */
object Embedding {

  val Dims = 768 // both providers are 768-dim (`config/settings.py:34,39`)
  val DefaultBatchSize = 32 // `config/settings.py:43`

  /** E1 — provider abstraction (`embedding_service.py:33-93`). `embed`
    * is batched: one call per `grouped(batchSize)` slice; failures
    * return None per-text (the reference skips failed chunks).
    */
  trait EmbeddingProvider extends Serializable {
    def name: String
    def modelName: String
    def dims: Int = Dims
    def embedOne(text: String): Array[Float]
    def embed(texts: Seq[String]): Seq[Option[Array[Float]]] =
      texts.map(t => try Some(embedOne(t)) catch { case _: Exception => None })
  }

  /** Deterministic hashing-trick embedder: lowercase word tokens hashed
    * into `dims` buckets with a ± sign bit, L2-normalized. Seeded per
    * provider so "nomic-local" and "granite-local" are distinguishable
    * (the reference's two providers return different vectors for the
    * same text).
    */
  final case class HashingProvider(name: String, modelName: String, seed: Int)
      extends EmbeddingProvider {
    override def embedOne(text: String): Array[Float] = {
      val acc = new Array[Float](dims)
      val tokens = Option(text).getOrElse("").toLowerCase.split("\\W+")
      var i = 0
      while (i < tokens.length) {
        val t = tokens(i)
        if (t.nonEmpty) {
          val h = MurmurHash3.stringHash(t, seed)
          val idx = java.lang.Math.floorMod(h, dims)
          val sign = if (((h >>> 31) & 1) == 0) 1.0f else -1.0f
          acc(idx) += sign
        }
        i += 1
      }
      var norm = 0.0
      var j = 0
      while (j < dims) { norm += acc(j).toDouble * acc(j); j += 1 }
      if (norm > 0) {
        val inv = (1.0 / math.sqrt(norm)).toFloat
        j = 0
        while (j < dims) { acc(j) *= inv; j += 1 }
      }
      acc
    }
  }

  /** E4 — retry with backoff (`embedding_service.py:45-50`: 3 attempts,
    * exponential wait). Local providers never throw transiently, but
    * the contract is preserved for pluggable remote providers; waits
    * are injectable so tests need not sleep.
    */
  final class RetryingProvider(inner: EmbeddingProvider, attempts: Int = 3,
                               sleep: Long => Unit = Thread.sleep)
      extends EmbeddingProvider {
    def name: String = inner.name
    def modelName: String = inner.modelName
    override def dims: Int = inner.dims
    override def embedOne(text: String): Array[Float] = {
      var n = 0
      var last: Exception = null
      while (n < attempts) {
        try return inner.embedOne(text)
        catch {
          case e: Exception =>
            last = e; n += 1
            if (n < attempts) sleep(math.min(math.max(4000L, 1000L << n), 10000L))
        }
      }
      throw last
    }
  }

  /** Provider registry (`embedding_service.py:126-137`). */
  val providers: Map[String, EmbeddingProvider] = Map(
    "nomic"   -> HashingProvider("nomic", "nomic-local-hash-768", seed = 0x6e6f6d69),
    "granite" -> HashingProvider("granite", "granite-local-hash-768", seed = 0x6772616e)
  )

  def provider(name: String): EmbeddingProvider =
    providers.getOrElse(name,
      throw new IllegalArgumentException(s"Unknown embedding provider: $name"))

  // -------------------------------------------------------- Spark operators

  /** E5 — batched distributed embedding of a chunks DataFrame
    * (columns: chunk_id, content). One output row per chunk that
    * embedded successfully (failure-skip, `embedding_service.py:206-212`).
    */
  def embedChunks(chunks: DataFrame, providerName: String,
                  batchSize: Int = DefaultBatchSize,
                  now: Timestamp = Timestamp.valueOf("2025-01-01 00:00:00"))
      : Dataset[EmbeddingRow] = {
    val p = provider(providerName)
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.select(col("chunk_id").cast("string"), col("content").cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val vecs = p.embed(batch.map(_._2))
          batch.iterator.zip(vecs.iterator).collect {
            case ((id, _), Some(v)) =>
              EmbeddingRow(id, p.name, v, p.modelName, now)
          }
        }
      }
  }

  /** E6 — cache-aside embedding as an anti-join (reference Redis probe
    * `embedding_service.py:147-151` + `embedding_cache.py:16-34`):
    * rows of `chunks` already present in `existing` (keyed chunk_id ×
    * provider) are reused; only misses are computed; result = hits ∪
    * fresh. The TTL tier (`cache_ttl=86400`) is the `maxAge` filter on
    * the probe side.
    *
    * CALLER CONTRACT — the cache is ID-keyed, deliberately: the hit
    * path reads only the chunk_id column (no corpus content IO), which
    * is sound because stored chunk content is immutable per chunk_id
    * outside ONE window — a re-ingest that replaces a reproduced id
    * with different text. The writer that opens that window owns it:
    * [[graft.Main.ingestBatch]] ERASES the replaced-and-changed ids'
    * rows (all providers) BEFORE its chunks commit, so they reach this
    * probe as ordinary misses and recompute from the new text — and
    * the erasure-first ordering is what keeps every crash window
    * convergent (the changed-id set is derived from pre-commit content
    * and is unrecoverable after the commit).
    *
    * At scale both sides should be bucketed by chunk_id so the semi/
    * anti joins are shuffle-free (SURVEY §4.1 partitioning note).
    */
  /** [[embedChunks]] memoized by CONTENT: each distinct content embeds
    * exactly once (dedup on the content hash BEFORE the provider runs)
    * and the vector fans back out to every chunk carrying it.
    * Overlapping chunkers and template text make verbatim repeats
    * common at corpus scale, and provider calls are the dominant cost —
    * two cheap hash shuffles buy an embed-call count equal to the
    * DISTINCT content count. Output is identical to [[embedChunks]]
    * (providers are pure functions of the text; a content that fails
    * to embed drops every chunk carrying it, same as the per-chunk
    * failure-skip).
    */
  def embedChunksDistinct(chunks: DataFrame, providerName: String,
                          batchSize: Int = DefaultBatchSize,
                          now: Timestamp = Timestamp.valueOf("2025-01-01 00:00:00"))
      : DataFrame = {
    // NULL content hashes through '' (md5(NULL) is NULL and would fall
    // out of the join; the provider itself maps null → zero vector, so
    // '' and null share one memo entry and one identical vector)
    val key = md5(coalesce(col("content"), lit("")))
    val uniq = chunks
      .select(key.as("chunk_id"), col("content"))
      .dropDuplicates("chunk_id")
    val uvecs = embedChunks(uniq, providerName, batchSize, now).toDF()
      .withColumnRenamed("chunk_id", "__ch")
    chunks.select(col("chunk_id").cast("string"), key.as("__ch"))
      .join(uvecs, Seq("__ch"))
      .select(col("chunk_id"), col("embedding_provider"), col("embedding"),
              col("model"), col("created_at"))
  }

  def embedWithCache(chunks: DataFrame, existing: DataFrame, providerName: String,
                     batchSize: Int = DefaultBatchSize,
                     now: Timestamp = Timestamp.valueOf("2025-01-01 00:00:00"),
                     maxAgeSeconds: Long = 86400L): DataFrame = {
    val fresh = existing
      .filter(col("embedding_provider") === providerName)
      .filter(unix_timestamp(lit(now)) - unix_timestamp(col("created_at")) < maxAgeSeconds)
    val hits = fresh.join(chunks.select("chunk_id"), Seq("chunk_id"), "left_semi")
    val misses = chunks.join(fresh.select("chunk_id"), Seq("chunk_id"), "left_anti")
    val computed = embedChunksDistinct(misses, providerName, batchSize, now)
    hits.select("chunk_id", "embedding_provider", "embedding", "model", "created_at")
      .unionByName(computed)
  }

  /** Embed a single query string on the driver (Q5 query-text embedding;
    * search entry path `cli/main.py:36-51`).
    */
  def embedQuery(text: String, providerName: String): Array[Float] =
    provider(providerName).embedOne(
      // stored chunk text is NFC (ingest boundary) and the local
      // providers are content-hash-deterministic, so an un-normalized
      // decomposed query would embed differently from the byte-equal
      // composed chunk — normalize symmetrically.
      graft.functions.NormalizeExpressions.nfcString(text))
}
