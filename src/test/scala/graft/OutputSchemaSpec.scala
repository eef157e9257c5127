package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-hash insurance: every oracle-checked output schema may contain
  * only types with ONE canonical cross-engine rendering — BIGINT, INT,
  * DOUBLE, VARCHAR, BOOLEAN, DATE, TIMESTAMP. DECIMAL(38,0) checksum
  * columns kept q55/q74/q88 driver-red for three rounds on value-identical
  * output (the driver's hash renders DECIMAL differently than the local
  * comparison did); this spec makes that failure class structurally
  * impossible to reintroduce. q86 is rows-only today but included so a
  * future oracle promotion can't re-trip it.
  */
class OutputSchemaSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Rows-only queries held to the same standard (promotion candidates). */
  private val promotable = Set("q86_streaming_upsert")

  private def allowed(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | DoubleType | StringType |
        BooleanType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  test("oracle-checked output schemas use only canonical-rendering types") {
    val s = TestSpark.spark
    val targets = SparkEntry.allDefs.filter(q =>
      q.oracle.isDefined || promotable(q.name))
    assert(targets.nonEmpty)
    val offenders = targets.flatMap { q =>
      q.run(s, sf).schema.fields.collect {
        case f if !allowed(f.dataType) =>
          s"${q.name}.${f.name}: ${f.dataType.sql}"
      }
    }
    assert(offenders.isEmpty,
      "render-sensitive types in oracle-checked outputs:\n"
        + offenders.mkString("\n"))
  }
}
