package graft

import graft.io.Pins
import graft.text.TextStats

/** localCheckpoint pin lifecycle: operators that pin a shared
  * intermediate leak MEMORY_AND_DISK storage unless released;
  * [[Pins.release]] frees exactly the pins in one result's plan,
  * [[Pins.sweepAll]] frees everything (the Verify/Bench idiom).
  */
class PinsSpec extends SparkSpec {
  import spark.implicits._

  private def pinned(): Int = spark.sparkContext.getPersistentRDDs.size

  test("release(df) frees the pin an operator created") {
    Pins.sweepAll(spark)
    val base = pinned()
    val docs = Seq((1L, "a b\n\nc d"), (2L, "a b\n\ne f")).toDF("doc_id", "text")
    val out = TextStats.dedupParagraphs(docs, "doc_id", "text")
    assert(pinned() > base, "dedupParagraphs pins its exploded table eagerly")
    out.count() // terminal action
    Pins.release(out)
    assert(pinned() == base, "release must drop the plan's localCheckpoint pins")
  }

  test("sweepAll frees pins not reachable from a kept result") {
    Pins.sweepAll(spark)
    val docs = Seq((1L, "x y z"), (2L, "x q r")).toDF("doc_id", "text")
    // hold the results in vals: an UNREFERENCED pinned RDD is fair game
    // for ContextCleaner's GC-driven unpersist at any moment (observed:
    // a later query's job triggered a GC and the first pin vanished
    // before the assert) — the spec tests sweepAll, not cleaner timing
    val a = TextStats.tfidfTopTerms(docs, "doc_id", "text")
    a.count()
    val b = TextStats.oovSignals(docs, "doc_id", "text")
    b.count()
    assert(pinned() >= 2)
    Pins.sweepAll(spark)
    assert(pinned() == 0)
    // keep a/b reachable to this point so the cleaner can't race the asserts
    assert((a ne null) && (b ne null))
  }
}
