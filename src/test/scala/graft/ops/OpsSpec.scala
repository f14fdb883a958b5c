package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class FlattenSpec extends SparkSpec {
  import spark.implicits._

  test("flattenStruct flattens nested structs to underscore paths (P1)") {
    val df = spark.read.json(Seq(
      """{"id":1,"total":{"passes":5,"duels":{"won":2}},"name":"x"}""").toDS())
    val flat = Flatten.flattenStruct(df)
    assert(flat.columns.sorted.toSeq == Seq("id", "name", "total_duels_won", "total_passes"))
    val r = flat.select("id", "total_duels_won", "total_passes").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 2L, 5L)))
  }

  test("stripPrefix drops prefix and rejects collisions (P4)") {
    val df = Seq((1, 2)).toDF("total_x", "y")
    assert(Flatten.stripPrefix(df, "total_").columns.toSeq == Seq("x", "y"))
    val clash = Seq((1, 2)).toDF("total_y", "y")
    assertThrows[IllegalArgumentException](Flatten.stripPrefix(clash, "total_"))
  }

  test("cleanHeaders collapses separators (P8)") {
    val df = Seq((1, 2)).toDF("Kick - Long", "Mark  Count")
    assert(Flatten.cleanHeaders(df).columns.toSeq == Seq("Kick Long", "Mark Count"))
  }
}

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private val games = Seq(
    // (player, matchId) — p1 has a tie at matchId 3
    ("p1", 1), ("p1", 2), ("p1", 3), ("p1", 3), ("p1", 4),
    ("p2", 10), ("p2", 11)).toDF("player", "matchId")

  test("lastN with rank() admits >n rows on ties — reference semantics (W1)") {
    val last3 = Windows.lastN(games, Seq("player"), col("matchId").desc, 3)
    // p1 desc: 4(r1), 3(r2), 3(r2), 2(r4) → ranks ≤3 keeps both 3s
    assert(last3.where($"player" === "p1").count() == 3)
    assert(last3.where($"player" === "p1").agg(min("matchId")).head().getInt(0) == 3)
  }

  test("globalIndex equals the single-partition row_number for any partition count") {
    import org.apache.spark.sql.expressions.Window
    val data = (0L until 500L).map(i => (i, (i * 2654435761L) % 1000))
      .toDF("id", "key")
    val naive = data.withColumn("pos",
        row_number().over(Window.orderBy("key", "id")).cast("long"))
      .select("id", "pos").as[(Long, Long)].collect().toMap
    for (parts <- Seq(1, 3, 7)) {
      val got = Windows.globalIndex(data, Seq("key", "id"), numParts = parts)
        .select("id", "pos").as[(Long, Long)].collect().toMap
      assert(got == naive, s"mismatch at numParts=$parts")
    }
  }

  test("globalIndex plans no single-partition data window") {
    val data = (0L until 100L).toDF("id")
    val plan = Windows.globalIndex(data, Seq("id"), numParts = 4)
      .queryExecution.executedPlan.toString
    // the per-row Window must partition by __pid; the only unpartitioned
    // window runs over the partition-count-sized offsets frame
    val dataWindows = "Window \\[row_number".r.findAllIn(plan).size
    assert(dataWindows == 1 && plan.contains("windowspecdefinition(__pid"))
  }

  test("lastN strict=row_number keeps exactly n (W1 variant)") {
    val last3 = Windows.lastN(games, Seq("player"), col("matchId").desc, 3,
      strict = true, tieBreak = Seq(col("matchId")))
    assert(last3.where($"player" === "p1").count() == 3)
  }

  test("keepBest is a deterministic argmax (A7)") {
    val df = Seq(("k", 1, 5.0), ("k", 2, 9.0), ("k", 3, 9.0)).toDF("key", "id", "score")
    val best = Windows.keepBest(df, Seq("key"), Seq(col("score").desc, col("id").asc))
    assert(best.select("id").head().getInt(0) == 2) // tie broken by min id
    assert(best.count() == 1)
  }

  test("cumcount is 0-based per group (A8)") {
    val df = Seq(("a", 1), ("a", 2), ("b", 7)).toDF("k", "v")
    val cc = Windows.cumcount(df, Seq("k"), Seq(col("v").asc))
    assert(cc.where($"k" === "a" && $"v" === 2).select("cumcount").head().getInt(0) == 1)
    assert(cc.where($"k" === "b").select("cumcount").head().getInt(0) == 0)
  }
}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("h", 5.0))
    .toDF("grp", "x")

  test("zscore sample vs population ddof (A4/A5 — SURVEY §7.4.1)") {
    val zs = Stats.zscore(df, Seq("grp"), Seq("x"), Stats.Sample)
      .where($"grp" === "g" && $"x" === 3.0).select("zs_x").head().getDouble(0)
    assert(math.abs(zs - 1.0) < 1e-12) // (3-2)/1 with ddof=1
    val zp = Stats.zscore(df, Seq("grp"), Seq("x"), Stats.Population)
      .where($"grp" === "g" && $"x" === 3.0).select("zs_x").head().getDouble(0)
    assert(math.abs(zp - math.sqrt(1.5)) < 1e-12) // (3-2)/sqrt(2/3)
  }

  test("zscore: zero-variance group and null stat give 0 (C11)") {
    val z = Stats.zscore(df, Seq("grp"), Seq("x"))
    assert(z.where($"grp" === "h").select("zs_x").head().getDouble(0) == 0.0)
    val withNull = Seq(("g", Some(1.0)), ("g", Some(3.0)), ("g", None))
      .toDF("grp", "x")
    val zn = Stats.zscore(withNull, Seq("grp"), Seq("x"))
    assert(zn.where($"x".isNull).select("zs_x").head().getDouble(0) == 0.0)
  }

  test("zscore group mean ~ 0 and sample std ~ 1 (property)") {
    val data = (1 to 50).map(i => ("g", (i * 37 % 11).toDouble)).toDF("grp", "x")
    val z = Stats.zscore(data, Seq("grp"), Seq("x"))
    val (m, s) = z.agg(avg("zs_x"), stddev_samp("zs_x")).as[(Double, Double)].head()
    assert(math.abs(m) < 1e-12 && math.abs(s - 1.0) < 1e-12)
  }

  test("invertStats flips configured columns only (C10)") {
    val df2 = Seq((1.0, 2.0)).toDF("zs_fouls", "zs_goals")
    val inv = Stats.invertStats(df2, Seq("zs_fouls"))
    val r = inv.head()
    assert(r.getDouble(0) == -1.0 && r.getDouble(1) == 2.0)
  }
}

class GroupsSpec extends SparkSpec {
  import spark.implicits._

  test("withAnyGroup doubles rows with sentinel; threshold carve-out keeps ANY (W2a/F2)") {
    val df = Seq(("GK", 90.0), ("CB", 20.0)).toDF("pos", "minutes")
    val any = Groups.withAnyGroup(df, "pos")
    assert(any.count() == 4)
    val kept = Groups.thresholdFilter(any, col("minutes"), 33.0, "pos")
    // GK(90) passes, CB(20) dropped, both ANY rows kept
    assert(kept.count() == 3)
    assert(kept.where($"pos" === "ANY").count() == 2)
  }

  test("enforceTypes pins int/string lists and defaults to double (C8)") {
    val df = Seq(("7", "x", "1.5")).toDF("age", "name", "passes")
    val typed = Groups.enforceTypes(df, intCols = Set("age"), stringCols = Set("name"))
    val sch = typed.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch == Map("age" -> "int", "name" -> "string", "passes" -> "double"))
  }
}

class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("weighted hierarchy matches hand computation (C12)") {
    // two profiles, one position, two stats: zs values chosen by hand
    val profiles = Seq(
      ("p1", "POS", 1.0, -1.0),
      ("p2", "POS", 0.0, 2.0)).toDF("profileId", "pos", "zs_a", "zs_b")
    val weights = Scoring.weightsDf(spark, Seq(
      ("POS", "a", 0.5, "M1", 1.0, "T1", 1.0, false),
      ("POS", "b", 1.0, "M2", 0.5, "T1", 1.0, true))) // b inverse
    val out = Scoring.score(profiles, Seq("profileId"), "pos", weights)
      .orderBy("profileId").collect()
    // p1: M1 = 0.5*1.0+2.5 = 3.0 ; M2 = 1.0*(+1.0)+2.5 = 3.5 (inverse flips -1)
    //     T1 = 1.0*3.0 + 0.5*3.5 = 4.75 ; Rating = 4.75
    val p1 = out(0)
    assert(p1.getAs[Double]("M1") == 3.0)
    assert(p1.getAs[Double]("M2") == 3.5)
    assert(p1.getAs[Double]("T1") == 4.75)
    assert(p1.getAs[Double]("Rating") == 4.75)
    // p2: M1 = 2.5 ; M2 = -2.0+2.5 = 0.5 ; T1 = 2.5 + 0.25 = 2.75
    val p2 = out(1)
    assert(p2.getAs[Double]("T1") == 2.75)
  }

  test("profiles whose position has no weights are not scored") {
    val profiles = Seq(("p1", "POS", 1.0), ("p2", "OTHER", 1.0))
      .toDF("profileId", "pos", "zs_a")
    val weights = Scoring.weightsDf(spark, Seq(
      ("POS", "a", 1.0, "M", 1.0, "T", 1.0, false)))
    val out = Scoring.score(profiles, Seq("profileId"), "pos", weights)
    assert(out.select("profileId").as[String].collect().toSeq == Seq("p1"))
  }
}
