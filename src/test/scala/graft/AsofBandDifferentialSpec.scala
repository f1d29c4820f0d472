package graft

import org.apache.spark.sql.functions._

import graft.plans.{AsofJoin, BandJoin}

/** Randomized differential testing for the two whole-operator execs:
  * seeded random datasets (small key domain + small time domain, so
  * ties, empty keys, and null times all occur) checked against
  * driver-side brute-force references, across every physical variant
  * (shuffled/broadcast × backward/forward × tolerance on/off). The
  * brute force is an independent restatement of the semantics — if the
  * merge, the binary searches, and the reference ever disagree on any
  * input, one of them is wrong and this fails with the seed in hand.
  */
case class DiffRow3(k: Long, t: Option[Long], id: Long)

class AsofBandDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private type Row3 = DiffRow3
  private val Row3 = DiffRow3

  private def randRows(seed: Int, n: Int, keys: Int, times: Int): Seq[Row3] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val t = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(times).toLong)
      Row3(rnd.nextInt(keys).toLong, t, i.toLong)
    }
  }

  test("asof: all four physical variants equal the brute-force reference (3 seeds)") {
    for (seed <- 1 to 3) {
      val lRows = randRows(seed, 250, keys = 6, times = 100)
      val rRows = randRows(seed + 100, 250, keys = 6, times = 100)
      val l = lRows.toDF("k", "t", "lid")
        .select(col("k"), col("t").cast("long").as("t"), col("lid"))
      val r = rRows.toDF("rk", "rt", "rid")
        .select(col("rk"), col("rt").cast("long").as("rt"), col("rid"))
      for {
        dir <- Seq("backward", "forward")
        tol <- Seq(None, Some(7L))
        bcast <- Seq(false, true)
      } {
        val got = AsofJoin.joinAsOf(l, r, "t", "rt", Seq("k"), Seq("rk"),
            tiebreak = Seq("rid"), toleranceUs = tol, direction = dir,
            broadcast = Some(bcast))
          .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
        val want: Map[Long, Option[Long]] = lRows.map { lr =>
          lr.id -> lr.t.flatMap { t =>
            val cands = rRows.filter(rr => rr.k == lr.k && rr.t.isDefined)
            val inDir =
              if (dir == "backward")
                cands.filter(rr => rr.t.get <= t &&
                  tol.forall(x => t - rr.t.get <= x))
              else
                cands.filter(rr => rr.t.get >= t &&
                  tol.forall(x => rr.t.get - t <= x))
            if (inDir.isEmpty) None
            else if (dir == "backward")
              Some(inDir.maxBy(rr => (rr.t.get, rr.id)).id)
            else Some(inDir.minBy(rr => (rr.t.get, rr.id)).id)
          }
        }.toMap
        assert(got === want,
          s"asof divergence: seed=$seed dir=$dir tol=$tol broadcast=$bcast")
      }
    }
  }

  test("band count: both physical variants equal the brute-force reference (3 seeds)") {
    val W = 10L
    for (seed <- 1 to 3) {
      val lRows = randRows(seed, 250, keys = 5, times = 80)
      val rRows = randRows(seed + 100, 250, keys = 5, times = 80)
      val l = lRows.toDF("k", "t", "lid")
        .select(col("k"), col("t").cast("long").as("t"), col("lid"))
      val r = rRows.toDF("rk", "rt", "rid")
        .select(col("rk"), col("rt").cast("long").as("rt"), col("rid"))
      for (bcast <- Seq(false, true)) {
        val got = BandJoin.bandCount(l, r, "t", "rt", Seq("k"), Seq("rk"),
            windowUs = W, broadcast = Some(bcast))
          .select("lid", "n_in_band").as[(Long, Long)].collect().toMap
        val want: Map[Long, Long] = lRows.map { lr =>
          lr.id -> lr.t.map { t =>
            rRows.count(rr => rr.k == lr.k &&
              rr.t.exists(x => x > t && x <= t + W)).toLong
          }.getOrElse(0L)
        }.toMap
        assert(got === want,
          s"band divergence: seed=$seed broadcast=$bcast")
      }
    }
  }
}
