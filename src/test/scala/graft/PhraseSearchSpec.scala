package graft

import graft.search.Search

/** Phrase search (q109): exact consecutive-token match via the
  * anchor-vote algebra — positions, overlap, and repeated-term
  * phrases, which the bag-of-words `textMatch` cannot express.
  */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], phrase: String) =
    Search.phraseOccurrences(docs.toDF("doc_id", "text"),
                             "doc_id", "text", phrase)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq

  test("exact occurrences and first position; order matters") {
    val docs = Seq(
      1L -> "a b c a b c a b",   // "a b" at 1, 4, 7
      2L -> "b a c b a",         // "a b" nowhere (bag overlaps, order no)
      3L -> "x a b y")           // once, offset by a leading token
    assert(run(docs, "a b") == Seq((1L, 3L, 1L), (3L, 1L, 2L)))
  }

  test("three-term phrase spans the middle; partial prefixes don't count") {
    val docs = Seq(
      1L -> "the table scan merge table scan",  // "table scan merge" once
      2L -> "table merge scan",                 // all terms, wrong order
      3L -> "table scan")                       // missing the third term
    assert(run(docs, "table scan merge") == Seq((1L, 1L, 2L)))
  }

  test("repeated-term phrase counts overlapping occurrences") {
    // "a a" in "a a a": anchors 1 and 2 overlap — both count
    assert(run(Seq(1L -> "a a a"), "a a") == Seq((1L, 2L, 1L)))
  }

  test("single-token phrase degenerates to term occurrences") {
    assert(run(Seq(1L -> "q w q e q"), "q") == Seq((1L, 3L, 1L)))
  }

  test("tokenization is the \\W+ lowercase model") {
    // punctuation separates; case folds — same model as textMatch/BM25
    assert(run(Seq(1L -> "Table, SCAN! done"), "table scan") ==
      Seq((1L, 1L, 1L)))
  }

  test("stored index: probe equals the inline form; the scan prunes to term buckets") {
    val docs = (1L to 40L).map(i =>
      (i, s"w$i table scan join w${i + 1} " * (i % 3 + 1).toInt))
    val df = docs.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_postings").toString
    Search.writePostings(df, "doc_id", "text", s"$dir/idx", nBuckets = 16)
    // no nBuckets on the probe: the layout comes from the index sidecar
    val stored = Search.phraseOccurrencesStored(spark, s"$dir/idx",
                                                "doc_id", "table scan")
    val inline = Search.phraseOccurrences(df, "doc_id", "text", "table scan")
    assert(stored.orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq ==
           inline.orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq)
    // the probe must prune at the DIRECTORY level: tb in PartitionFilters
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
           plan.replaceAll("\\s", "").matches("(?s).*PartitionFilters:\\[.*tb.*\\].*"),
           s"term buckets must prune as partitions: $plan")
  }

  test("textMatchStored: ids equal the inline match; the scan prunes to term buckets; empty probes are typed") {
    val docs = (1L to 40L).map(i =>
      (i, if (i % 3 == 0) s"alpha table beta w$i" else s"gamma scan delta w$i"))
    val df = docs.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_postings_tm").toString
    Search.writePostings(df, "doc_id", "text", s"$dir/idx", nBuckets = 16)
    val stored = Search.textMatchStored(spark, s"$dir/idx", "doc_id",
                                        "table scan")
    val inline = Search.textMatch(df, "text", "table scan").select("doc_id")
    assert(stored.orderBy("doc_id").as[Long].collect().toSeq ==
           inline.orderBy("doc_id").as[Long].collect().toSeq)
    assert(stored.count() == 40L, "every doc matches one of the two terms")
    // the probe must prune at the DIRECTORY level: tb in PartitionFilters
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
           plan.replaceAll("\\s", "").matches("(?s).*PartitionFilters:\\[.*tb.*\\].*"),
           s"term buckets must prune as partitions: $plan")
    // a token absent from the corpus matches nothing; a tokenless
    // query returns the typed empty frame, not a crash
    assert(Search.textMatchStored(spark, s"$dir/idx", "doc_id",
                                  "zzznope").count() == 0L)
    val empty = Search.textMatchStored(spark, s"$dir/idx", "doc_id", "...")
    assert(empty.count() == 0L &&
           empty.schema.head.dataType.sql.toLowerCase == "bigint")
  }

  test("appendPostings: incremental docs probe identically to a full rebuild") {
    val first = (1L to 20L).map(i => (i, s"alpha table scan beta w$i"))
    val later = (21L to 30L).map(i => (i, s"gamma table scan delta w$i"))
    val dir = java.nio.file.Files.createTempDirectory("graft_postings_a").toString
    Search.writePostings(first.toDF("doc_id", "text"), "doc_id", "text",
                         s"$dir/idx", nBuckets = 16)
    // append picks the bucket count up from the sidecar — no caller arg
    Search.appendPostings(spark, later.toDF("doc_id", "text"),
                          "doc_id", "text", s"$dir/idx")
    val stored = Search.phraseOccurrencesStored(spark, s"$dir/idx",
                                                "doc_id", "table scan")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val inline = Search.phraseOccurrences((first ++ later).toDF("doc_id", "text"),
                                          "doc_id", "text", "table scan")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(stored == inline && stored.size == 30)
  }

  test("removeFromPostings: removed doc stops matching, untouched tb= dirs byte-identical") {
    // doc 5 shares the probe phrase with the others but also carries a
    // UNIQUE token, so its vocabulary (and the rewritten buckets) is a
    // strict superset of nothing — some buckets hold only other docs
    val docs = (1L to 30L).map(i => (i, s"alpha table scan beta w$i only$i"))
    val dir = java.nio.file.Files.createTempDirectory("graft_postings_rm").toString
    Search.writePostings(docs.toDF("doc_id", "text"), "doc_id", "text",
                         s"$dir/idx", nBuckets = 32)
    val before = snapshot(s"$dir/idx")
    val removedDocs = docs.filter(d => d._1 == 5L || d._1 == 17L)
    // the removed docs' own text drives the bucket set — same recipe as
    // the write side
    Search.removeFromPostings(spark, removedDocs.toDF("doc_id", "text"),
                              "doc_id", "text", s"$dir/idx")

    // takedown semantics: the removed docs serve NO phrase matches
    val got = Search.phraseOccurrencesStored(spark, s"$dir/idx",
                                             "doc_id", "table scan")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val expect = Search.phraseOccurrences(
        docs.filterNot(d => d._1 == 5L || d._1 == 17L).toDF("doc_id", "text"),
        "doc_id", "text", "table scan")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == expect && !got.exists(r => r._1 == 5L || r._1 == 17L))
    // and their unique tokens are gone entirely (not just out-voted)
    assert(Search.phraseOccurrencesStored(spark, s"$dir/idx", "doc_id", "only5")
             .count() == 0)

    // only the buckets the removed docs' terms hash to were rewritten
    val after = snapshot(s"$dir/idx")
    val removedToks = removedDocs.flatMap(_._2.toLowerCase.split("\\W+")).toSet
    val touched: Set[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      removedToks.filter(_.nonEmpty).map(t =>
        "tb=" + (java.lang.Long.parseLong(
          md.digest(t.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
          16) % 32))
    }
    val untouched = before.keySet.filterNot(rel => touched.exists(rel.startsWith))
    assert(untouched.nonEmpty, "fixture must leave some buckets untouched")
    untouched.foreach { rel =>
      assert(after.get(rel) == before.get(rel),
             s"untouched bucket file $rel must keep its exact bytes")
    }
    assert(!new java.io.File(s"$dir/idx.tmp").exists &&
           after.keySet.forall(!_.contains(".trash")), "no tmp/trash leftovers")
  }

  test("an index emptied by removals keeps working: probe empty, further maintenance no-ops") {
    // removeFromPostings can remove the LAST document, leaving only
    // the sidecar — probes and later maintenance must treat that as
    // "no postings", never die on schema inference over an empty dir
    val doc = Seq((1L, "solo alpha table scan document"))
    val dir = java.nio.file.Files.createTempDirectory("graft_postings_e").toString
    Search.writePostings(doc.toDF("doc_id", "text"), "doc_id", "text",
                         s"$dir/idx", nBuckets = 8)
    Search.removeFromPostings(spark, doc.toDF("doc_id", "text"),
                              "doc_id", "text", s"$dir/idx")
    // every bucket held only doc 1 → all tb= dirs are gone (the norms
    // SIBLING remains, emptied, so N/T read as zero)
    assert(snapshot(s"$dir/idx").isEmpty, "all buckets should be removed")
    val emptyProbe = Search.phraseOccurrencesStored(spark, s"$dir/idx",
                                                    "doc_id", "table scan")
    assert(emptyProbe.count() == 0)
    // the empty result keeps the WRITTEN id type (sidecar-recorded) —
    // a string fallback would break unions/joins with live results
    assert(emptyProbe.schema("doc_id").dataType ==
             org.apache.spark.sql.types.LongType,
           emptyProbe.schema.toString)
    // further removal is a no-op, and an append revives the index
    Search.removeFromPostings(spark, doc.toDF("doc_id", "text"),
                              "doc_id", "text", s"$dir/idx")
    Search.appendPostings(spark, doc.toDF("doc_id", "text"),
                          "doc_id", "text", s"$dir/idx")
    assert(Search.phraseOccurrencesStored(spark, s"$dir/idx",
                                          "doc_id", "table scan").count() == 1)
  }

  test("compactPostings: appended small files merge per bucket, probes and pruning unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_postings_c").toString
    Search.writePostings((1L to 10L).map(i => (i, s"alpha table scan w$i"))
                           .toDF("doc_id", "text"),
                         "doc_id", "text", s"$dir/idx", nBuckets = 8)
    Search.appendPostings(spark, (11L to 20L).map(i => (i, s"beta table scan w$i"))
                            .toDF("doc_id", "text"), "doc_id", "text", s"$dir/idx")
    Search.appendPostings(spark, (21L to 30L).map(i => (i, s"gamma table scan w$i"))
                            .toDF("doc_id", "text"), "doc_id", "text", s"$dir/idx")
    val beforeProbe = Search.phraseOccurrencesStored(spark, s"$dir/idx",
                                                     "doc_id", "table scan")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // compaction reports the WHOLE index: tb= buckets plus the norms
    // sibling (which accumulates one file per append batch)
    val beforeFiles =
      snapshot(s"$dir/idx").size + snapshot(s"$dir/idx.norms").size

    val (nBefore, nAfter) = Search.compactPostings(spark, s"$dir/idx")
    assert(nBefore == beforeFiles && nAfter < nBefore,
           s"compaction must shrink file count, $nBefore -> $nAfter")
    assert(snapshot(s"$dir/idx.norms").size == 1,
           "norms sibling must compact to one file")

    val stored = Search.phraseOccurrencesStored(spark, s"$dir/idx",
                                                "doc_id", "table scan")
    assert(stored.orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
             == beforeProbe, "compaction must not change probe results")
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.replaceAll("\\s", "").matches("(?s).*PartitionFilters:\\[.*tb.*\\].*"),
           s"pruning must survive compaction: $plan")
  }

  test("appendPostings refuses a directory without index metadata") {
    val dir = java.nio.file.Files.createTempDirectory("graft_postings_b").toString
    val e = intercept[IllegalArgumentException] {
      Search.appendPostings(spark, Seq((1L, "x")).toDF("doc_id", "text"),
                            "doc_id", "text", s"$dir/nothere")
    }
    assert(e.getMessage.contains("postings metadata"))
  }

  test("plan: no UDF, no cartesian; aggregates run on the term sliver") {
    val df = Search.phraseOccurrences(
      Seq((1L, "table scan join")).toDF("doc_id", "text"),
      "doc_id", "text", "table scan")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("), "must stay codegen-native")
    assert(!plan.contains("CartesianProduct"))
    // the phrase-term filter sits below the first exchange: the only
    // shuffled rows are occurrences of the query's terms
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("table"), "term literals must reach the plan")
  }
}
