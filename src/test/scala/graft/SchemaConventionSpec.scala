package graft

import org.apache.spark.sql.types._

/** Pins the FIXTURES.md §C output-schema convention for EVERY registered
  * query: no DECIMAL, array, map, struct, or raw timestamp in an emitted
  * schema. Round 1 lost 10 value-identical queries to decimal columns
  * (the driver's pandas hash represents them engine-differently) and one
  * to an array column (unsortable there); this spec makes that class of
  * regression impossible to reintroduce silently.
  */
class SchemaConventionSpec extends SparkSpec {

  private val allowed: DataType => Boolean = {
    case _: StringType | _: BooleanType | _: DateType => true
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType => true
    case _: FloatType | _: DoubleType => true
    case _ => false
  }

  test("no query emits DECIMAL / array / map / struct / timestamp columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, sf).schema.fields.collect {
        case f if !allowed(f.dataType) => s"$name.${f.name}: ${f.dataType.sql}"
      }
    }
    assert(offenders.isEmpty,
      "driver-hostile output columns:\n" + offenders.mkString("\n"))
  }
}
