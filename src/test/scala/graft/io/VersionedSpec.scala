package graft.io

import graft.SparkSpec

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  test("append commits accumulate; old snapshots are immutable") {
    val tbl = java.nio.file.Files.createTempDirectory("ver").toString + "/t"
    assert(Versioned.commit(Seq(1, 2, 3).toDF("x"), tbl) === 1)
    assert(Versioned.commit(Seq(4, 5).toDF("x"), tbl) === 2)
    assert(Versioned.snapshot(spark, tbl, 1).as[Int].collect().sorted
      === Array(1, 2, 3))
    assert(Versioned.snapshot(spark, tbl, 2).as[Int].collect().sorted
      === Array(1, 2, 3, 4, 5))
    // latest by default
    assert(Versioned.snapshot(spark, tbl).count() === 5)
  }

  test("overwrite commit starts the file list fresh; history still readable") {
    val tbl = java.nio.file.Files.createTempDirectory("ver").toString + "/t"
    Versioned.commit(Seq(1, 2).toDF("x"), tbl)
    Versioned.commit(Seq(9).toDF("x"), tbl, overwrite = true)
    assert(Versioned.snapshot(spark, tbl, 2).as[Int].collect().toSeq === Seq(9))
    assert(Versioned.snapshot(spark, tbl, 1).as[Int].collect().sorted
      === Array(1, 2))
    assert(Versioned.latestVersion(tbl) === 2)
  }

  test("reading an empty table fails fast") {
    val tbl = java.nio.file.Files.createTempDirectory("ver").toString + "/t"
    intercept[IllegalArgumentException] {
      Versioned.snapshot(spark, tbl)
    }
  }
}
