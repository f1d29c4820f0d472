package graft
import org.apache.spark.sql.SparkSession
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = "/root/testdata/sf0.1/lineitem.parquet"
    spark.read.parquet(p) // warm listing caches
    var t0 = System.nanoTime()
    (1 to 100).foreach(_ => spark.read.parquet(p))
    println(f"inferred: ${(System.nanoTime()-t0)/1e9/100*1000}%.2f ms/read")
    val sch = spark.read.parquet(p).schema
    t0 = System.nanoTime()
    (1 to 100).foreach(_ => spark.read.schema(sch).parquet(p))
    println(f"explicit: ${(System.nanoTime()-t0)/1e9/100*1000}%.2f ms/read")
    spark.stop()
  }
}
