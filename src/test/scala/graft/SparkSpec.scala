package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs — mirrors Verify's session config
  * (UTC, nanosAsLong for the driver's events table, micros parquet out).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val Sf001 = "/root/testdata/sf0.001"
  val Sf01 = "/root/testdata/sf0.01"
  override def afterAll(): Unit = () // session shared across suites

  /** Byte-identity snapshot of a stored index tree: relative path →
    * file length, data files only. Shared by the index-maintenance
    * specs (IVF, IVF-PQ, postings) to assert untouched partitions keep
    * their exact files across append/remove/compact.
    */
  protected def snapshot(root: String): Map[String, Long] = {
    val base = new java.io.File(root)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(base).filter(_.getName.startsWith("part-"))
      .map(f => base.toPath.relativize(f.toPath).toString -> f.length()).toMap
  }

  /** Recursive file-tree copy — the fixture-planting twin of
    * `Tables.rmTree`, shared by the crash/stale-aside specs that
    * stage a table's duplicate (e.g. a `.trash` aside) without
    * touching the original's inodes.
    */
  protected def copyTree(src: java.io.File, dst: java.io.File): Unit =
    if (src.isDirectory) {
      java.nio.file.Files.createDirectories(dst.toPath)
      Option(src.listFiles()).getOrElse(Array.empty)
        .foreach(f => copyTree(f, new java.io.File(dst, f.getName)))
    } else java.nio.file.Files.copy(src.toPath, dst.toPath)

  /** Driver-side twin of `Dedup.hashBucket`/`splitAssign` (md5 hex
    * prefix → 80/10/10), for specs that need to know a fixture id's
    * split without running Spark.
    */
  protected def splitName(id: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val b = java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.optimizer.excludedRules",
              GraftExtensions.ExcludedOptimizerRules)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
              java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Pins.release dropping a dead localCheckpoint pin logs a benign
    // "locally checkpointed ... cannot be recomputed" WARN per pin —
    // expected-by-contract (same rationale and scope as Bench's
    // suppression), so quiet that one logger in the test session too.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    // ...and WindowExec's single-partition WARN: global windows here
    // are only ever aggregate-bounded (see Bench's identical note)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}
