package graft

import org.apache.spark.sql.types._
import graft.io.Tables

/** DRIVER-DATA SCHEMA CANARY — the /root/testdata tables are
  * regenerated outside this repo, and a silent type drift there is an
  * analysis-time break here (round 9: `events.ts` moved from parquet
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS)-no-tz, i.e. LongType →
  * TimestampNTZType under Spark's readers, and every `unix_micros(ts)`
  * call site failed). This spec turns the next regeneration into a
  * one-line diagnosis: it asserts every column of every table reads as
  * one of the logical types the engine has a handling path for, and
  * fails naming the exact (table, column, got, accepted) tuple.
  */
class SchemaCanarySpec extends SparkSpec {

  // Accepted RAW types per (table, column) as Spark reads the parquet
  // under the session config (nanosAsLong=true; no-tz micros → NTZ).
  // A set per column: every member has a tested normalization or
  // directly-consumable path in the engine.
  private val accepted: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map(
      "r_regionkey" -> Set(IntegerType, LongType),
      "r_name" -> Set(StringType)),
    "nation" -> Map(
      "n_nationkey" -> Set(IntegerType, LongType),
      "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType, LongType)),
    "customer" -> Map(
      "c_custkey" -> Set(LongType),
      "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType, LongType),
      "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map(
      "s_suppkey" -> Set(LongType),
      "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType, LongType),
      "s_acctbal" -> Set(DoubleType)),
    "part" -> Map(
      "p_partkey" -> Set(LongType),
      "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType),
      "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType, LongType),
      "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map(
      "o_orderkey" -> Set(LongType),
      "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType),
      "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> Set(TimestampType, TimestampNTZType, DateType),
      "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map(
      "l_orderkey" -> Set(LongType),
      "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType),
      "l_linenumber" -> Set(IntegerType, LongType),
      "l_quantity" -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType),
      "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType),
      "l_linestatus" -> Set(StringType),
      "l_shipdate" -> Set(TimestampType, TimestampNTZType, DateType)),
    "events" -> Map(
      // the three encodings the driver has shipped; Tables.load
      // normalizes all to TimestampType (asserted separately below)
      "event_id" -> Set(LongType),
      "ts" -> Set(LongType, TimestampType, TimestampNTZType),
      "user_id" -> Set(LongType),
      "event_type" -> Set(StringType),
      "value" -> Set(DoubleType),
      "props" -> Set(StringType)),
    "documents" -> Map(
      "doc_id" -> Set(LongType),
      "text" -> Set(StringType),
      "lang" -> Set(StringType),
      "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Map(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false)),
      "label" -> Set(IntegerType, LongType))
  )

  test("every driver table column reads as an accepted logical type") {
    val drifted = for {
      (table, cols) <- accepted.toSeq.sortBy(_._1)
      schema = spark.read.parquet(s"$Sf001/$table.parquet").schema
      problem <- {
        val missing = cols.keySet -- schema.fieldNames.toSet
        val bad = schema.fields.toSeq.flatMap { f =>
          cols.get(f.name) match {
            case Some(ok) if !ok.contains(f.dataType) =>
              Some(s"$table.${f.name}: got ${f.dataType.simpleString}, " +
                   s"accepted {${ok.map(_.simpleString).mkString(", ")}}")
            case _ => None
          }
        }
        missing.toSeq.map(c => s"$table.$c: COLUMN MISSING") ++ bad
      }
    } yield problem
    assert(drifted.isEmpty,
      s"\nDRIVER DATA DRIFTED — regenerate handling paths for:\n  " +
        drifted.mkString("\n  ") +
        "\n(see io/Tables.scala time-type contract; round-9 postmortem in VERDICT.md)")
  }

  test("Tables.load normalizes events.ts to TimestampType regardless of encoding") {
    val ts = Tables.load(spark, Sf001, "events").schema("ts")
    assert(ts.dataType == TimestampType,
      s"events.ts after load: got ${ts.dataType.simpleString}, want timestamp — " +
        "extend Tables.load's normalization fold for the new on-disk encoding")
  }
}
