package graft.io

import org.apache.spark.sql.types._
import graft.SparkSpec

class QuarantineSpec extends SparkSpec {
  import spark.implicits._

  test("readJsonWithQuarantine splits parsed rows from malformed raw lines") {
    val dir = java.nio.file.Files.createTempDirectory("quarantine").toString
    val lines = Seq(
      """{"id": 1, "name": "ok"}""",
      """{"id": 2, "name": "also ok"}""",
      """{"id": 3, "name": """,          // truncated JSON
      """not json at all""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "feed.json"),
      lines.mkString("\n").getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val (good, bad) = Quarantine.readJsonWithQuarantine(spark, dir, schema)
    assert(good.as[(Long, String)].collect().toSet ==
      Set((1L, "ok"), (2L, "also ok")))
    assert(good.columns.toSeq == Seq("id", "name")) // corrupt col not leaked
    val rawBad = bad.select("raw").as[String].collect().toSet
    assert(rawBad == Set("""{"id": 3, "name": """, "not json at all"))
    assert(bad.columns.contains("source_file"))
  }

  test("clean input quarantines nothing; fully-bad input parses nothing") {
    val dir = java.nio.file.Files.createTempDirectory("quarantine2").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "bad.json"), "garbage\nmore garbage".getBytes)
    val schema = StructType(Seq(StructField("id", LongType)))
    val (good, bad) = Quarantine.readJsonWithQuarantine(spark, dir, schema)
    assert(good.count() == 0 && bad.count() == 2)
  }
}
