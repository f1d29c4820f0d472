package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Sanity/semantics checks for the relational suite. Cross-engine value
  * parity is enforced by the DuckDB oracle harness (tools/verify.sh);
  * these specs pin the Spark-side semantics that the oracle can't see
  * (plan shapes are covered separately in PlanSpec).
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("zorder: both dims prunable; lex perfect on its key, blind on the other") {
    val rows = Relational.qZorder(spark, sf)
      .as[(String, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._4, r._5)).toMap
    val (zP, zS) = rows("zorder")
    val (lP, lS) = rows("lex")
    // lex: near-perfect partkey spans, but every file spans ~all suppkeys
    assert(lP < 100000, s"lex partkey span $lP ppm")
    assert(lS > 800000, s"lex suppkey span $lS ppm — fixture too small?")
    // zorder: BOTH dims well under half their global span (the balance
    // the layout exists for), suppkey dramatically better than lex
    assert(zP < 500000 && zS < 500000, s"zorder spans $zP/$zS ppm")
    assert(zS * 2 < lS, s"zorder suppkey $zS ppm not clearly below lex $lS")
  }

  test("every relational query returns rows at sf0.001") {
    Relational.queries.foreach { case (name, (fn, _)) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("q_regression matches Spark's built-in regr_slope/regr_r2 within float tolerance") {
    // the exact-integer-moment fit against the engine's own
    // double-accumulating aggregates: equal up to their float error
    val ours = Relational.qRegression(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val ref = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("slope"),
        expr("regr_intercept(l_extendedprice, l_quantity)").as("icept"),
        expr("regr_r2(l_extendedprice, l_quantity)").as("r2"))
      .as[(String, Double, Double, Double)].collect()
    assert(ref.nonEmpty)
    ref.foreach { case (flag, slope, icept, r2) =>
      val (_, n, s2, i2, r22) = ours(flag)
      assert(n > 0)
      assert(math.abs(slope - s2) <= 1e-6 * math.max(1.0, math.abs(slope)), s"$flag slope $slope vs $s2")
      assert(math.abs(icept - i2) <= 1e-6 * math.max(1.0, math.abs(icept)), s"$flag intercept")
      assert(math.abs(r2 - r22) <= 1e-6, s"$flag r2 $r2 vs $r22")
    }
  }

  test("q_profile: counts and distincts match direct queries; one row per column") {
    val li = Tables.lineitem(spark, sf)
    val total = li.count()
    val rows = Relational.qProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size === 11)
    assert(rows.values.forall(_.getLong(1) === total))
    // spot-check one numeric, one string, the timestamp
    assert(rows("l_partkey").getLong(3) ===
      li.select(countDistinct(col("l_partkey"))).as[Long].head())
    assert(rows("l_returnflag").getString(7) === "R") // max flag
    val minTs = li.agg(min(unix_timestamp(col("l_shipdate")))).as[Long].head()
    assert(rows("l_shipdate").getDouble(4) === minTs.toDouble)
    assert(rows.values.forall(_.getLong(2) === 0L), "fixture has no nulls")
  }

  test("q_topk returns exactly k rows in descending price order") {
    val prices = Relational.qTopK(spark, sf).select("o_totalprice").as[Double].collect()
    assert(prices.length === 10)
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("q_window_rank keeps at most 3 orders per customer") {
    val perCust = Relational.qWindowRank(spark, sf)
      .groupBy("o_custkey").count().select(max("count")).as[Long].head()
    assert(perCust <= 3)
  }

  test("q_rollup grand total equals table count") {
    val grand = Relational.qRollup(spark, sf)
      .filter(col("gid") === 3).select("n").as[Long].head()
    assert(grand === Tables.lineitem(spark, sf).count())
  }

  test("setops: |a except b| + |a intersect b| = |a|") {
    val m = Relational.qSetOps(spark, sf).as[(String, Long)].collect().toMap
    val a = Tables.orders(spark, sf).filter(col("o_totalprice") > 150000)
      .select("o_custkey").distinct().count()
    assert(m("except") + m("intersect") === a)
    assert(m("union") >= math.max(a, m("intersect")))
  }

  test("semi + anti partition the customer set per predicate") {
    val withBig = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_totalprice") > 250000),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    val withoutBig = Relational.qAntiJoin(spark, sf)
      .agg(sum("n_cust")).as[Long].head()
    assert(withBig + withoutBig === Tables.customer(spark, sf).count())
  }

  test("approx distinct: within_bound true everywhere; sketch tighter than 5%") {
    val rows = Relational.qApproxDistinct(spark, sf)
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, _, ok) => assert(ok, s"$flag sketch out of bound") }
    // the sketch is actually far tighter than the query's 10% gate
    val approx = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("a"))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (flag, exact, _) =>
      assert(math.abs(approx(flag) - exact).toDouble / exact < 0.05,
        s"$flag ${approx(flag)} vs $exact")
    }
    // the PRODUCTION shape is the sketch alone — mergeable fixed-size
    // state, no distinct expansion; the validation query above is the
    // harness, not the 100 TB plan
    val prodPlan = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .queryExecution.optimizedPlan.toString
    assert(!prodPlan.toLowerCase.contains("count(distinct") && !prodPlan.contains("Expand"),
      s"exact distinct leaked into sketch-only plan:\n$prodPlan")
    assert(prodPlan.split("Aggregate ").length == 2,
      s"more than one aggregate:\n$prodPlan")
  }

  test("approx percentile: within_bound true everywhere; discrete exact ≈ interpolated") {
    val interp = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
           expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .as[(String, Double, Double)].collect()
      .map { case (f, a, b) => f -> (a, b) }.toMap
    val rows = Relational.qApproxPercentile(spark, sf)
      .as[(String, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, e50, e95, ok) =>
      assert(ok, s"$flag sketch out of rank bound")
      val (i50, i95) = interp(flag)
      assert(math.abs(e50 - i50) / i50 < 0.02, s"$flag p50 $e50 vs $i50")
      assert(math.abs(e95 - i95) / i95 < 0.02, s"$flag p95 $e95 vs $i95")
    }
  }

  test("salted join equals the plain join it replaces") {
    import spark.implicits._
    val salted = Relational.qJoinSalted(spark, sf)
      .as[(String, Double, Long)].collect().toSeq
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
      .as[(String, Double, Long)].collect().toSeq
    assert(salted === plain)
  }

  test("partial salting splits fixture keys across both join paths") {
    // HotKeyThreshold is deliberately inside the 1..7 lineitem-count
    // range so the salted (hot) and plain (cold) paths both carry rows
    // at every SF — a threshold no fixture key reaches would leave the
    // salted path dead code in every test and oracle run
    val counts = Tables.lineitem(spark, sf).groupBy("l_orderkey").count()
    val hot = counts.filter(col("count") >= Relational.HotKeyThreshold).count()
    val cold = counts.filter(col("count") < Relational.HotKeyThreshold).count()
    assert(hot > 0 && cold > 0)
  }

  test("skew stats agree with direct recounts of the key distribution") {
    val row = Relational.qSkewStats(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double, Double)].head()
    val (nKeys, total, maxCnt, p50, p99, skewRatio, top1) = row
    val li = Tables.lineitem(spark, sf)
    assert(total === li.count())
    assert(nKeys === li.select("l_suppkey").distinct().count())
    val trueMax = li.groupBy("l_suppkey").count()
      .agg(max("count")).as[Long].head()
    assert(maxCnt === trueMax)
    // ratio/share recomputed from the already-verified integers
    assert(math.abs(skewRatio - BigDecimal(maxCnt.toDouble * nKeys / total)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(top1 - BigDecimal(maxCnt.toDouble / total)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(skewRatio >= 1.0 && top1 > 0.0 && top1 <= 1.0)
    assert(p50 <= p99 && p99 <= maxCnt.toDouble)
  }

  test("sql interface result equals the DataFrame-API semi join shape") {
    val viaSql = Relational.qSqlInterface(spark, sf).as[(String, Long)].collect().toMap
    val viaApi = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf).filter(col("l_quantity") > 49),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").count().as[(String, Long)].collect().toMap
    assert(viaSql === viaApi)
  }

  test("ltv triangle: conserves orders and revenue; age-0 cell equals cohort size") {
    val tri = Relational.qLtv(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS p")
      .as[(Long, Long, Double)].collect()
    // every order lands in exactly one triangle cell
    assert(tri.map(_._4).sum === orders.length.toLong)
    assert(math.abs(tri.map(_._5).sum - orders.map(_._3).sum) < 1e-4)
    // the age-0 diagonal counts each cohort's full membership (every
    // customer is active in their own first month by definition)
    val cohortOf = orders.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cohortSize = cohortOf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    tri.filter(_._2 == 0L).foreach { case (c, _, active, _, _) =>
      assert(active === cohortSize(c), s"cohort $c")
    }
    assert(tri.exists(_._2 > 0), "fixture should span multi-month lifetimes")
    // offsets never precede the cohort month
    assert(tri.forall(_._2 >= 0))
  }

  test("basket pairs: lift identity recomputed from raw counts; bounded top-k plan") {
    import spark.implicits._
    val rows = Relational.qBasket(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // recompute one pair's lift from the raw fixture
    val po = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect()
    val byPart = po.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val nOrders = po.map(_._1).distinct.length.toDouble
    rows.take(5).foreach { case (a, b, nab, lift) =>
      val want = (byPart(a) & byPart(b)).size
      assert(nab === want.toLong, s"pair ($a,$b) support")
      val wantLift = nab * nOrders / (byPart(a).size.toDouble * byPart(b).size)
      assert(math.abs(lift - wantLift) < 1e-9, s"pair ($a,$b) lift")
    }
    // the global cut is a TakeOrdered, and pair generation is an
    // order-keyed equi-join, not a product
    val plan = Relational.qBasket(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("skyline equals brute-force dominance; frontier properties hold") {
    import spark.implicits._
    val sky = Relational.qSkyline(spark, sf)
      .as[(Long, Double, Int)].collect().toSeq
    val all = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .as[(Long, Double, Int)].collect().toSeq
    def dominated(p: (Long, Double, Int)) = all.exists(q =>
      q._2 <= p._2 && q._3 <= p._3 && (q._2 < p._2 || q._3 < p._3))
    val want = all.filterNot(dominated).sortBy(_._1)
    assert(sky == want && sky.nonEmpty)
    // frontier property: sorted by price, sizes strictly decrease
    // across distinct prices (no skyline point is beaten on both dims)
    val byPrice = sky.sortBy(p => (p._2, p._3))
    byPrice.zip(byPrice.tail).foreach { case (a, b) =>
      if (a._2 < b._2) assert(b._3 < a._3, s"$a vs $b not a staircase")
    }
    // the grid prune actually bites: the frontier is far smaller than
    // the corpus, so the exact phase ran on a reduced candidate set
    assert(sky.length < all.length / 4)
  }
}
