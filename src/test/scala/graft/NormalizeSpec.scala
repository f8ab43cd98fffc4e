package graft

import org.apache.spark.sql.functions._

import graft.functions.NormalizeExpressions

/** Unicode NFC normalization (q132): canonical composition so
  * precomposed and decomposed encodings of the same visible text hash
  * identically — the pass exact dedup / shingles / vocab induction
  * need before anything else touches the corpus. All non-ASCII is
  * written as explicit \\u escapes: composed vs decomposed forms are
  * visually identical, and a literal would hide which one the source
  * actually contains.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val Decomposed = "cafe\u0301"  // e + COMBINING ACUTE
  private val Composed = "caf\u00e9"     // precomposed \u00e9
  private val Angstrom = "\u212b"        // ANGSTROM SIGN (singleton -> U+00C5)
  private val ARingComposed = "\u00c5"   // precomposed A-ring
  private val ARingDecomposed = "A\u030a" // A + COMBINING RING

  private def nfcOf(s: String): String =
    Seq(s).toDF("t")
      .select(NormalizeExpressions.nfcNormalize(col("t")))
      .as[String].head()

  test("composes the canonical cases: combining marks and singleton points") {
    assert(nfcOf(Decomposed) == Composed)
    assert(nfcOf(Decomposed).length == 4)
    assert(nfcOf(ARingDecomposed) == ARingComposed)
    assert(nfcOf(Angstrom) == ARingComposed)
  }

  test("identity on ASCII and already-composed text (fast path), idempotent") {
    val ascii = "plain ascii text 123"
    assert(nfcOf(ascii) == ascii)
    assert(nfcOf(Composed) == Composed)
    assert(nfcOf(nfcOf(Decomposed)) == nfcOf(Decomposed))
  }

  test("null passes through; plan has no UDF and no shuffle") {
    val df = Seq(Some(Composed), None).toDF("t")
      .select(NormalizeExpressions.nfcNormalize(col("t")).as("n"))
    assert(df.as[Option[String]].collect().toSet == Set(Some(Composed), None))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF(") && !plan.contains("Exchange"), plan)
  }

  test("equal-after-NFC strings get equal md5 — the dedup property") {
    val hashes = Seq(Composed, Decomposed).toDF("t")
      .select(md5(NormalizeExpressions.nfcNormalize(col("t"))))
      .as[String].collect().toSet
    assert(hashes.size == 1)
  }

  test("driver-side nfcString mirrors the kernel, identity reference on clean input") {
    assert(NormalizeExpressions.nfcString(Decomposed) == Composed)
    assert(NormalizeExpressions.nfcString(Angstrom) == ARingComposed)
    val clean = "already composed café"
    assert(NormalizeExpressions.nfcString(clean) eq clean)
    assert(NormalizeExpressions.nfcString(null) == null)
  }

  // Stored text is NFC at the ingest boundary; these pin the SYMMETRY:
  // a decomposed-form query must find composed-form stored text through
  // every search entry point. Without query-side normalization each of
  // these silently returns empty (the \W token model splits the
  // combining mark differently: "cafe" + U+0301 tokenizes as "cafe",
  // composed "café" as "caf").

  private val storedDocs = Seq(
    ("d1", s"the $Composed menu lists the $Composed specials"),
    ("d2", "unrelated filler content")).toDF("id", "content")
  private val decomposedQuery = s"$Decomposed menu"

  test("decomposed query finds composed stored text: BM25 (both IDF variants)") {
    val hits = graft.search.Search
      .bm25TopK(storedDocs, "id", "content", decomposedQuery, k = 5)
      .select("id").as[String].collect()
    assert(hits.headOption.contains("d1"), hits.toSeq)
    val hitsLog = graft.search.Search
      .bm25LogTopK(storedDocs, "id", "content", decomposedQuery, k = 5)
      .select("id").as[String].collect()
    assert(hitsLog.headOption.contains("d1"), hitsLog.toSeq)
  }

  test("decomposed query finds composed stored text: token match and phrase") {
    val matched = graft.search.Search
      .textMatch(storedDocs, "content", decomposedQuery)
      .select("id").as[String].collect()
    assert(matched.toSeq == Seq("d1"))
    val occ = graft.search.Search
      .phraseOccurrences(storedDocs, "id", "content", decomposedQuery)
      .collect()
    assert(occ.length == 1 && occ.head.getAs[String]("id") == "d1")
    assert(occ.head.getAs[Long]("n_occurrences") == 1L)
  }

  test("decomposed query finds composed stored text: stored postings index") {
    val path = java.nio.file.Files.createTempDirectory("nfc_postings").toString +
      "/postings.idx"
    graft.search.Search.writePostings(storedDocs, "id", "content", path, nBuckets = 8)
    val occ = graft.search.Search
      .phraseOccurrencesStored(spark, path, "id", decomposedQuery)
      .collect()
    assert(occ.length == 1 && occ.head.getAs[String]("id") == "d1")
  }

  test("decomposed query embeds identically to composed stored text: kNN") {
    import graft.embed.Embedding
    val emb = Seq(("c1", Embedding.provider("nomic").embedOne(Composed)),
                  ("c2", Embedding.provider("nomic").embedOne("other words")))
      .toDF("chunk_id", "embedding")
    val qv = Embedding.embedQuery(Decomposed, "nomic")
    val top = graft.search.Search
      .knn(emb, qv.toSeq, k = 1, tieBreak = Seq(col("chunk_id"))).collect()
    assert(top.head.getAs[String]("chunk_id") == "c1")
    // exact-match chunk: cosine 1 → ES-parity score 2
    assert(math.abs(top.head.getAs[Double]("score") - 2.0) < 1e-6)
  }
}
