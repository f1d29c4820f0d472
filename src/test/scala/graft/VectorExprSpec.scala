package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Vectors

/** The native codegen'd FloatDotProduct must be BIT-identical to the
  * portable higher-order form (same left-to-right double fold) — that
  * equivalence is what lets the fast path serve oracle-checked queries.
  */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  test("native dot == HOF dot, bit-exact, on fixture embeddings") {
    val diff = Tables.embeddings(spark, sf)
      .select(Vectors.dot(col("embedding"), col("embedding")).as("fast"),
        Vectors.dotHof(col("embedding"), col("embedding")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("native dot == HOF dot on random float arrays (property)") {
    val genVec = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
    val pairs = (1 to 200).flatMap { i =>
      for {
        a <- genVec(Gen.Parameters.default, Seed(i.toLong))
        b <- genVec(Gen.Parameters.default, Seed(-i.toLong))
      } yield (a, b)
    }
    val rows = pairs.toDF("a", "b")
      .select(Vectors.dot(col("a"), col("b")).as("fast"),
        Vectors.dotHof(col("a"), col("b")).as("ref"))
      .as[(Double, Double)].collect()
    rows.foreach { case (fast, ref) =>
      assert(java.lang.Double.doubleToLongBits(fast) ===
        java.lang.Double.doubleToLongBits(ref))
    }
  }

  test("float_dot is registered and callable from SQL") {
    org.apache.spark.sql.graft.GraftSql.ensureRegistered(spark)
    val r = spark.sql("SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), " +
      "array(CAST(2 AS FLOAT), CAST(3 AS FLOAT))) AS d").as[Double].head()
    assert(r === 9.0)
  }

  test("interpreted eval path (nullSafeEval) matches codegen") {
    // force interpreted evaluation by turning codegen off for one query
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val r = Tables.embeddings(spark, sf)
        .select(Vectors.dot(col("embedding"), col("embedding")).as("d"),
          Vectors.dotHof(col("embedding"), col("embedding")).as("ref"))
        .filter(col("d") =!= col("ref"))
      assert(r.count() === 0)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
