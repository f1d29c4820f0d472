package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Events

/** Sink-side coverage: partitioned parquet layout with partition pruning
  * at read time — the layout decision that turns a 100 TB scan into a
  * targeted read.
  */
class SinksSpec extends SparkSpec {

  test("partitionBy write + partition-pruned read-back") {
    val out = Files.createTempDirectory("graft_part").toFile.getAbsolutePath + "/events"
    val ev = Events.load(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)

    val back = spark.read.parquet(out).filter(col("event_type") === "click")
    back.collect()
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      "partition pruning missing:\n" + plan.take(800))
    assert(back.count() === ev.filter(col("event_type") === "click").count())

    // round-trip fidelity over all partitions
    val total = spark.read.parquet(out).count()
    assert(total === ev.count())
  }
}
