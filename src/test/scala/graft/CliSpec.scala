package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CLI contract (`WordScoreMain` in a forked JVM, like a real
  * submission): usage → exit 2 with no Spark startup; a good run → exit
  * 0, tab-delimited `score\tword` output sorted by score descending,
  * with `-D` conf overrides accepted ToolRunner-style.
  */
class CliSpec extends AnyFunSuite {

  private def runMain(args: Seq[String]): (Int, String) = {
    val java = sys.props("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Dspark.master=local[2]",
      "-Dspark.sql.session.timeZone=UTC", "-Xmx2g",
      "-cp", sys.props("java.class.path"), "graft.WordScoreMain") ++ args
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    (proc.waitFor(), out)
  }

  test("no/misused args exit 2 with usage, before any Spark startup") {
    val (code, out) = runMain(Seq())
    assert(code === 2, out.takeRight(500))
    assert(out.contains("Usage:"))
    val (code2, _) = runMain(Seq("-Dbad", "in", "out"))
    assert(code2 === 2)
  }

  test("golden run: exit 0, sorted score\\tword output, -D accepted") {
    val dir = Files.createTempDirectory("cli_in").toFile
    Files.writeString(new java.io.File(dir, "reviews.json").toPath,
      """{"stars": 5.0, "text": "great great food"}
        |{"stars": 1.0, "text": "great awful service"}
        |""".stripMargin)
    val out = Files.createTempDirectory("cli_out").toFile.getAbsolutePath + "/scores"
    val (code, log) = runMain(Seq(
      "-Dspark.sql.shuffle.partitions=2", dir.getAbsolutePath, out))
    assert(code === 0, log.takeRight(1500))
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
    assert(files.length === 1, s"expected one part file in $out")
    val lines = Files.readAllLines(files.head.toPath).toArray.map(_.toString)
    // great = 2·(+2) + (−2) = 2, food = +2 (tied); awful = service = −2
    val parsed = lines.map { l => val Array(sc, w) = l.split("\t"); (w, sc.toLong) }
    assert(parsed.toMap === Map(
      "great" -> 2L, "food" -> 2L, "awful" -> -2L, "service" -> -2L))
    val scores = parsed.map(_._2)
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }
}
