package graft

import java.nio.file.Files

import graft.operators.WordScore
import graft.sources.SequenceFiles

/** Reference-format interop: SequenceFile<Text, IntWritable> round trip
  * (the reference's job-1 intermediate, ComputeWordScore.java:170-176).
  */
class SequenceFileSpec extends SparkSpec {
  import spark.implicits._

  test("word scores round-trip through the reference's SequenceFile format") {
    val path = Files.createTempDirectory("graft_seq").toFile.getAbsolutePath + "/ws"
    val scored = WordScore.flagship(Tables.documents(spark, sf))
    SequenceFiles.writeWordScores(scored, path)
    val back = SequenceFiles.readWordScores(spark, path)
      .as[(String, Long)].collect().toMap
    val expected = scored.as[(String, Long)].collect().toMap
    assert(back === expected)

    // and the read frame itself round-trips through write again
    val path2 = path + "_2"
    SequenceFiles.writeWordScores(SequenceFiles.readWordScores(spark, path), path2)
    assert(SequenceFiles.readWordScores(spark, path2)
      .as[(String, Long)].collect().toMap === expected)
  }
}
