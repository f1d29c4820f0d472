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

  test("oracle lint: SUM-floor-division and quantiles are CAST/round-wrapped") {
    // The r6 hash miss: `SUM(gap_us) // COUNT(*) AS avg_gap_us` —
    // DuckDB promotes SUM(BIGINT) to HUGEINT, `//` keeps it, pandas
    // renders HUGEINT as float64 while Spark's column is int64, and
    // the driver's bit-level frame hash fails on the dtype alone
    // (values identical). This lint machine-enforces the convention
    // for the two HUGEINT/typed-quantile shapes that can surface
    // uncast; tools/parity.py's dtype comparison is the full runtime
    // net (it checks every column of every query at verify time).
    // Bare SUM(int) aliased in an intermediate CTE is fine — it only
    // matters if it SURFACES, which parity.py catches.
    // Only a SURFACING value can drift the frame dtype: flag a match
    // only when the first `AS alias` after it names a column of the
    // paired Spark query's output schema (an intermediate CTE column —
    // e_rfm's quantile cut points, say — is compared/cast downstream
    // and never reaches pandas).
    val sumFloorDiv = "(?i)(?<!CAST\\s{0,3}\\()SUM\\s*\\([^()]*\\)\\s*//".r
    val bareQuantile = "(?i)(?<!CAST\\s{0,3}\\()(?<!round\\s{0,3}\\()quantile_(cont|disc)\\s*\\(".r
    val alias = "(?i)\\bAS\\s+(\\w+)".r
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val outCols = SparkEntry.queries(name)(spark, sf).schema.fieldNames.toSet
        def flag(re: scala.util.matching.Regex, kind: String) =
          re.findAllMatchIn(sql).flatMap { m =>
            alias.findFirstMatchIn(sql.substring(m.end)).map(_.group(1))
              .filter(outCols.contains)
              .map(a => s"$name: $kind surfaces as output column '$a'")
          }
        flag(sumFloorDiv, "uncast SUM(...)//") ++
          flag(bareQuantile, "unwrapped quantile")
    }
    assert(offenders.isEmpty,
      "oracle expressions whose DuckDB output dtype will drift from Spark's " +
        "(wrap in CAST(... AS BIGINT/DOUBLE)):\n" + offenders.mkString("\n"))
  }
}
