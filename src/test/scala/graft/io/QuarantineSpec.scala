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
    val q = Quarantine.readJsonWithQuarantine(spark, dir, schema)
    assert(q.good.as[(Long, String)].collect().toSet ==
      Set((1L, "ok"), (2L, "also ok")))
    assert(q.good.columns.toSeq == Seq("id", "name")) // corrupt col not leaked
    val rawBad = q.bad.select("raw").as[String].collect().toSet
    assert(rawBad == Set("""{"id": 3, "name": """, "not json at all"))
    assert(q.bad.columns.contains("source_file"))
    assert(q.raw.storageLevel.useMemory) // split rides the persisted parse
    q.release()
    assert(!q.raw.storageLevel.useMemory) // caller can drop the pin
  }

  test("clean input quarantines nothing; fully-bad input parses nothing") {
    val dir = java.nio.file.Files.createTempDirectory("quarantine2").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "bad.json"), "garbage\nmore garbage".getBytes)
    val schema = StructType(Seq(StructField("id", LongType)))
    val q = Quarantine.readJsonWithQuarantine(spark, dir, schema)
    assert(q.good.count() == 0 && q.bad.count() == 2)
    q.release()
  }
}
