package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The generalization of the r10 lesson (EventsSchemaSpec): the driver can
  * regenerate `/root/testdata` BETWEEN rounds, and a silent schema drift
  * turns into 17 red queries with a confusing analysis error deep inside
  * some operator. This spec pins the COLUMN CONTRACT the query surface
  * actually depends on — names present with compatible type families, not
  * byte-exact schemas (exact pins would turn benign regenerations into
  * false alarms; the events nanos→micros switch is handled adaptively in
  * `Q.events` and tested there). A failure here after a regeneration
  * pinpoints the drifted table and column in one line.
  */
class TableContractSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private sealed trait Fam
  private case object Integral extends Fam
  private case object Fractional extends Fam
  private case object Str extends Fam
  private case object Dt extends Fam
  private case object FloatArray extends Fam
  private case object Bin extends Fam

  private def fam(t: DataType): Set[Fam] = t match {
    case ByteType | ShortType | IntegerType | LongType => Set(Integral)
    case FloatType | DoubleType => Set(Fractional)
    case _: DecimalType => Set(Fractional)
    case StringType => Set(Str)
    case DateType => Set(Dt)
    case TimestampType | TimestampNTZType => Set(Dt)
    // nanos-generation events read ts as long until Q.events normalizes
    case ArrayType(FloatType | DoubleType, _) => Set(FloatArray)
    case BinaryType => Set(Bin)
    case _ => Set.empty
  }

  /** table -> required (column, type family) pairs the queries consume. */
  private val contract: Map[String, Seq[(String, Fam)]] = Map(
    "region" -> Seq("r_regionkey" -> Integral, "r_name" -> Str),
    "nation" -> Seq("n_nationkey" -> Integral, "n_regionkey" -> Integral,
      "n_name" -> Str),
    "customer" -> Seq("c_custkey" -> Integral, "c_nationkey" -> Integral,
      "c_acctbal" -> Fractional, "c_mktsegment" -> Str),
    "supplier" -> Seq("s_suppkey" -> Integral, "s_nationkey" -> Integral),
    "part" -> Seq("p_partkey" -> Integral, "p_type" -> Str,
      "p_retailprice" -> Fractional),
    "orders" -> Seq("o_orderkey" -> Integral, "o_custkey" -> Integral,
      "o_orderdate" -> Dt, "o_totalprice" -> Fractional,
      "o_orderstatus" -> Str),
    "lineitem" -> Seq("l_orderkey" -> Integral, "l_partkey" -> Integral,
      "l_suppkey" -> Integral, "l_linenumber" -> Integral,
      "l_quantity" -> Fractional, "l_extendedprice" -> Fractional,
      "l_discount" -> Fractional, "l_tax" -> Fractional,
      "l_returnflag" -> Str, "l_linestatus" -> Str, "l_shipdate" -> Dt),
    "documents" -> Seq("doc_id" -> Integral, "text" -> Str,
      "source" -> Str, "lang" -> Str, "n_chars" -> Integral),
    "embeddings" -> Seq("vec_id" -> Integral, "embedding" -> FloatArray))

  test("every table carries the columns and type families the queries consume") {
    val problems = Seq.newBuilder[String]
    contract.toSeq.sortBy(_._1).foreach { case (table, cols) =>
      val schema = spark.read.parquet(s"$dir/$table.parquet").schema
      cols.foreach { case (name, family) =>
        schema.find(_.name == name) match {
          case None =>
            problems += s"$table.$name: MISSING (has ${schema.fieldNames.mkString(", ")})"
          case Some(f) if !fam(f.dataType).contains(family) =>
            problems += s"$table.$name: ${f.dataType.simpleString} is not $family"
          case _ => ()
        }
      }
    }
    val bad = problems.result()
    assert(bad.isEmpty,
      s"testdata regeneration drifted from the query contract:\n${bad.mkString("\n")}")
  }

  test("events carries the columns the adaptive reader normalizes") {
    // ts deliberately NOT pinned here: both the nanos-long and the
    // micros-timestamp generations are valid inputs (EventsSchemaSpec
    // proves both read identically through Q.events).
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    for (c <- Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
      assert(schema.fieldNames.contains(c), s"events.$c missing")
    val normalized = Q.events(spark, dir).schema("ts").dataType
    assert(normalized == TimestampNTZType)
  }
}
