package graft

import org.apache.spark.sql.functions._

import graft.operators.Materialize

/** Pins the part of Materialize that silently regressed once: releasing
  * a pin must free the ACTUAL persisted blocks (RDD-level for
  * localCheckpoint), not just issue a no-op Dataset.unpersist.
  */
class MaterializeSpec extends SparkSpec {

  // both tests exercise the localCheckpoint branch of pin(), which is
  // only taken when the shared session has NO checkpoint dir — another
  // suite (DedupSpec) sets one temporarily, so clear it explicitly
  // rather than depending on suite ordering
  private def requireLocalPinPath(): Unit =
    spark.sparkContext.setCheckpointDir(null)

  test("pin persists at the RDD level and releaseAll really unpersists it") {
    requireLocalPinPath()
    val pinned = Materialize.pin(
      spark.range(1000).select(col("id"), (col("id") * 2).as("x")))
    val rdd = org.apache.spark.sql.graft.GraftSql.underlyingRdd(pinned)
      .getOrElse(fail("pinned frame has no LogicalRDD leaf"))
    assert(rdd.getStorageLevel.useMemory || rdd.getStorageLevel.useDisk,
      "pinned RDD should hold persisted blocks")
    assert(pinned.count() === 1000)
    Materialize.releaseAll(spark)
    assert(rdd.getStorageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "releaseAll must drop the RDD-level persistence")
  }

  test("a released pin no longer occupies block-manager storage") {
    requireLocalPinPath()
    val pinned = Materialize.pin(spark.range(5000).toDF("id"))
    assert(pinned.count() === 5000)
    val rdd = org.apache.spark.sql.graft.GraftSql.underlyingRdd(pinned).get
    val sc = spark.sparkContext
    def resident(): Boolean =
      sc.getRDDStorageInfo.exists(i => i.id == rdd.id && i.numCachedPartitions > 0)
    assert(resident(), "pin should be resident before release")
    Materialize.releaseAll(spark)
    assert(!resident(), "release should evict the pin's blocks")
  }
}
