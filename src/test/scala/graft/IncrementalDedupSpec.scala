package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions.substring

/** Cross-RUN dedup (the q73 probe wired into ingest): a near-dup
  * arriving in a later run is caught against the persisted signature
  * table — without re-shingling the stored corpus — and the keep-one
  * decision can go either way: the arrival is marked duplicate, or it
  * outscores the stored doc, which is then DEMOTED (documents row
  * flips, chunks/embeddings/signatures pruned).
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val t1 = Timestamp.valueOf("2025-06-01 12:00:00")
  private val t2 = Timestamp.valueOf("2025-06-01 13:00:00")

  private def ingestOne(store: String, name: String, text: String,
                        at: Timestamp): Unit = {
    val in = Files.createTempDirectory("graft_inc_in").toFile
    Files.write(new java.io.File(in, name).toPath, text.getBytes("UTF-8"))
    Main.runIngest(spark, in.toString, store, "nomic", at)
  }

  private def statusByFile(store: String): Map[String, (String, String, String)] =
    spark.read.parquet(s"$store/documents.parquet")
      .select($"filename", $"doc_id", $"status", $"metadata_json")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap

  test("identical text in a later run: exactly one doc stays kept") {
    val store = Files.createTempDirectory("graft_inc_store").toString
    val text = "incremental dedup fixture with plenty of shingle tokens to sign"
    ingestOne(store, "first.txt", text, t1)
    ingestOne(store, "second.txt", text, t2)

    val docs = statusByFile(store)
    assert(docs.size == 2)
    val dups = docs.filter(_._2._2 == "duplicate")
    val kept = docs.filter(_._2._2 != "duplicate")
    assert(dups.size == 1 && kept.size == 1, docs.toString)
    assert(dups.head._2._3 == s"""{"duplicate_of":"${kept.head._2._1}"}""")

    // store surface: only the keeper is chunked/embedded/signed
    val chunkDocs = spark.read.parquet(s"$store/chunks.parquet")
      .select($"doc_id").distinct().as[String].collect().toSet
    assert(chunkDocs == Set(kept.head._2._1), "only the kept doc keeps chunks")
    val sigDocs = spark.read.parquet(s"$store/signatures.parquet")
      .select($"doc").distinct().as[String].collect().toSet
    assert(sigDocs == Set(kept.head._2._1), "signature index holds kept docs only")
  }

  test("longer near-dup arriving later DEMOTES the stored doc") {
    val store = Files.createTempDirectory("graft_inc_store2").toString
    val base = "shared near duplicate corpus text with many stable shingles " +
               "covering the same opening passage of the document"
    ingestOne(store, "short.txt", base, t1)
    ingestOne(store, "long.txt", base + " and an extra closing sentence appended", t2)

    val docs = statusByFile(store)
    val (shortId, shortStatus, shortMeta) = docs("short.md")
    val (longId, longStatus, _) = docs("long.md")
    assert(longStatus != "duplicate" && longStatus != "failed",
           s"longer doc must win: $docs")
    assert(shortStatus == "duplicate", s"stored doc must be demoted: $docs")
    assert(shortMeta == s"""{"duplicate_of":"$longId"}""")

    val chunkDocs = spark.read.parquet(s"$store/chunks.parquet")
      .select($"doc_id").distinct().as[String].collect().toSet
    assert(chunkDocs == Set(longId), "demoted doc's chunks are pruned")
    val embPrefixes = spark.read.parquet(s"$store/embeddings.parquet")
      .select(substring($"chunk_id", 1, 64).as("d")).distinct().as[String].collect().toSet
    assert(embPrefixes == Set(longId), "demoted doc's embeddings are pruned")
    val sigDocs = spark.read.parquet(s"$store/signatures.parquet")
      .select($"doc").distinct().as[String].collect().toSet
    assert(sigDocs == Set(longId), "demoted doc leaves the signature index")
  }

  test("unrelated text in a later run stays kept (no false cross-run match)") {
    val store = Files.createTempDirectory("graft_inc_store3").toString
    ingestOne(store, "one.txt", "a document about distributed query planning internals", t1)
    ingestOne(store, "two.txt", "completely different cooking recipe with butter and sugar", t2)
    val docs = statusByFile(store)
    assert(docs.values.forall(s => s._2 != "duplicate" && s._2 != "failed"),
           docs.toString)
    val sigDocs = spark.read.parquet(s"$store/signatures.parquet")
      .select($"doc").distinct().as[String].collect().toSet
    assert(sigDocs.size == 2, "both docs signed in the index")
  }

  test("clustering from a STORED signature table ≡ from-scratch (q133/q134)") {
    import graft.dedup.Dedup
    import org.apache.spark.sql.functions.{col, length}
    // three near-dup groups + singletons, enough shingles to sign
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val docs = Seq(
      (1L, base), (2L, base + " today"), (3L, base + " again and again"),
      (4L, "completely unrelated cooking recipe with butter sugar and flour mixed"),
      (5L, "completely unrelated cooking recipe with butter sugar and flour baked"),
      (6L, "a lone singleton document about distributed query planning internals"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))

    val sigPath = Files.createTempDirectory("graft_sig_store").toString + "/sigs"
    Dedup.minhashSignatures(docs, "doc_id", "text", nBands = 4)
      .write.parquet(sigPath)
    val stored = spark.read.parquet(sigPath)

    val scratch = Dedup.dupClusters(
        docs, "doc_id",
        Dedup.minhashCandidates(docs, "doc_id", "text", nBands = 4),
        "a_id", "b_id")
      .orderBy("doc_id").collect().toSeq
    val fromSigs = Dedup.dupClustersFromSigs(docs, "doc_id", stored)
      .orderBy("doc_id").collect().toSeq
    assert(fromSigs == scratch)
    // sanity: the fixture actually clusters (not all singletons)
    assert(scratch.map(_.getLong(1)).distinct.size < docs.count())

    val scratchKeep = Dedup.keepOne(
        docs, "doc_id", col("n_chars"),
        Dedup.minhashCandidates(docs, "doc_id", "text", nBands = 4),
        "a_id", "b_id")
      .select("doc_id", "comp", "keep").orderBy("doc_id").collect().toSeq
    val fromSigsKeep = Dedup.keepOneFromSigs(docs, "doc_id", col("n_chars"), stored)
      .select("doc_id", "comp", "keep").orderBy("doc_id").collect().toSeq
    assert(fromSigsKeep == scratchKeep)
    assert(scratchKeep.count(_.getBoolean(2)) ==
           scratch.map(_.getLong(1)).distinct.size,
           "exactly one keeper per cluster")
  }
}
