package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.catalyst.CentroidExpressions
import graft.operators.Similarity

/** The size-independent centroid assignment (NearestCell/NearestCells —
  * one matrix literal, generated argmax loop) pinned bit-for-bit against
  * the struct-cascade formulation it replaced. The cascade is rebuilt
  * HERE as the reference: max/sort over (dot, -index) structs — the exact
  * expression tree Similarity.nearestCentroid(s) used through round 11,
  * whose semantics every Lloyd-loop oracle replays. */
class CentroidExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16

  private def cents(nLists: Int): Seq[Array[Double]] =
    (0 until nLists).map { c =>
      val raw = Array.tabulate(dims)(j => math.sin(c * dims + j * 7))
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }

  private val vecs = (0 until 200).map { i =>
    (i.toLong, Array.tabulate(dims)(j => math.cos(i * dims + j) * 3))
  }.toDF("id", "v")

  // the round-11 cascade, verbatim (the reference semantics)
  private def cascadeCell(vec: org.apache.spark.sql.Column,
                          cs: Seq[Array[Double]]): org.apache.spark.sql.Column =
    array_max(array(cs.zipWithIndex.map { case (c, i) =>
      struct(graft.functions.catalyst.VectorExpressions
        .dotProduct(vec, typedlit(c)).as("s"), lit(-i).as("ni"))
    }: _*)).getField("ni") * -1

  private def cascadeCells(vec: org.apache.spark.sql.Column,
                           cs: Seq[Array[Double]],
                           nProbe: Int): org.apache.spark.sql.Column = {
    val scored = array(cs.zipWithIndex.map { case (c, i) =>
      struct(graft.functions.catalyst.VectorExpressions
        .dotProduct(vec, typedlit(c)).as("s"), lit(-i).as("ni"))
    }: _*)
    transform(slice(reverse(array_sort(scored)), 1, nProbe),
      s => s.getField("ni") * -1)
  }

  for (nLists <- Seq(3, 16, 64))
    test(s"NearestCell == struct-cascade argmax at nLists=$nLists") {
      val cs = cents(nLists)
      val m = typedlit(cs.map(_.toSeq))
      val both = vecs.select(
        CentroidExpressions.nearestCell($"v", m).as("loop"),
        cascadeCell($"v", cs).as("cascade"))
      assert(both.where($"loop" =!= $"cascade").count() == 0)
      // and the assignment is non-degenerate (multiple cells hit)
      assert(both.select("loop").distinct().count() > 1)
    }

  for ((nLists, nProbe) <- Seq((8, 1), (16, 4), (16, 16), (4, 9)))
    test(s"NearestCells == sorted-cascade top-$nProbe at nLists=$nLists " +
      "(incl. nProbe > nLists)") {
      val cs = cents(nLists)
      val m = typedlit(cs.map(_.toSeq))
      val both = vecs.select(
        CentroidExpressions.nearestCells($"v", m, nProbe).as("loop"),
        cascadeCells($"v", cs, nProbe).as("cascade"))
      assert(both.where(to_json($"loop") =!= to_json($"cascade")).count() == 0)
    }

  // the round-11 PQ argmin cascade, verbatim (the reference semantics)
  private def cascadeCodeL2(vec: org.apache.spark.sql.Column,
                            cs: Seq[Array[Double]]): org.apache.spark.sql.Column =
    array_min(array(cs.zipWithIndex.map { case (c, ci) =>
      struct(graft.functions.catalyst.VectorExpressions
        .l2Squared(vec, typedlit(c.toSeq)).as("d"), lit(ci).as("c"))
    }: _*)).getField("c")

  for (nCodes <- Seq(4, 64, 256))
    test(s"NearestCodeL2 == struct-cascade argmin at nCodes=$nCodes") {
      val cs = cents(nCodes)
      val both = vecs.select(
        graft.functions.catalyst.CentroidExpressions
          .nearestCodeL2($"v", cs).as("loop"),
        cascadeCodeL2($"v", cs).as("cascade"))
      assert(both.where($"loop" =!= $"cascade").count() == 0)
      assert(both.select("loop").distinct().count() > 1)
    }

  test("NearestCodeL2 exact ties take the LOWEST code id") {
    val dup = cents(4).toArray
    dup(3) = dup(0) // duplicate the nearest-by-construction candidates
    val got = vecs.select(
      graft.functions.catalyst.CentroidExpressions
        .nearestCodeL2($"v", dup.toSeq).as("loop"),
      cascadeCodeL2($"v", dup.toSeq).as("cascade")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // codes 0 and 3 are identical, so 3 can never win an argmin — a tie
    // must resolve to the lower id on both formulations
    assert(got.forall(_.getInt(0) != 3))
    // and the duplicated code is actually the winner for some vectors
    // (otherwise the tie branch was never exercised)
    assert(got.exists(_.getInt(0) == 0))
  }

  test("exact-tie vectors take the LOWEST cell index (both probes)") {
    // duplicate centroid ⇒ every vector scores cells 1 and 2 identically;
    // the contract (and the cascade's max-by (s, -i)) picks index 1
    val dup = cents(4).toArray
    dup(2) = dup(1)
    val m = typedlit(dup.toSeq.map(_.toSeq))
    val got = vecs.select(
      CentroidExpressions.nearestCell($"v", m).as("cell"),
      CentroidExpressions.nearestCells($"v", m, 4).as("cells"),
      cascadeCell($"v", dup.toSeq).as("cc"),
      cascadeCells($"v", dup.toSeq, 4).as("ccs")).collect()
    got.foreach { r =>
      assert(r.getInt(0) != 2) // never the higher twin
      assert(r.getInt(0) == r.getInt(2))
      assert(r.getSeq[Int](1) == r.getSeq[Int](3))
      // the twin pair appears adjacent and in ascending-index order
      val s = r.getSeq[Int](1)
      assert(s.indexOf(1) >= 0 && s.indexOf(2) == s.indexOf(1) + 1)
    }
  }

  test("assignment survives CODEGEN_ONLY (no interpreted fallback) and matches eval") {
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val cs = cents(32)
      val m = typedlit(cs.map(_.toSeq))
      val out = vecs.select($"id",
        CentroidExpressions.nearestCell($"v", m).as("cell"),
        CentroidExpressions.nearestCells($"v", m, 4).as("cells")).collect()
      assert(out.length == 200)
      out.foreach { r =>
        assert(r.getSeq[Int](2).head == r.getInt(1)) // best-first contract
      }
    } finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("SQL surface: nearest_cell/nearest_cells registered and == Column API") {
    graft.functions.SqlSurface.register(spark)
    vecs.createOrReplaceTempView("cent_vecs")
    val cs = cents(16)
    val lit16 = cs.map(_.map(x => s"${x}D").mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    val viaSql = spark.sql(
      s"""SELECT id, nearest_cell(v, $lit16) AS cell,
         |       nearest_cells(v, $lit16, 3) AS cells
         |FROM cent_vecs""".stripMargin)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2)))).toMap
    val m = typedlit(cs.map(_.toSeq))
    val viaCol = vecs.select($"id",
        CentroidExpressions.nearestCell($"v", m).as("cell"),
        CentroidExpressions.nearestCells($"v", m, 3).as("cells"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2)))).toMap
    assert(viaSql == viaCol)
  }
}
