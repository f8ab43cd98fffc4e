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
    TextStats.tfidfTopTerms(docs, "doc_id", "text").count()
    TextStats.oovSignals(docs, "doc_id", "text").count()
    assert(pinned() >= 2)
    Pins.sweepAll(spark)
    assert(pinned() == 0)
  }
}
