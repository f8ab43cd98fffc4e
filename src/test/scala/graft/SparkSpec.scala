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
    s
  }
}
