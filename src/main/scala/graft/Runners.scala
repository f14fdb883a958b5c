package graft

/** Shared plumbing for the runner mains (Bench/Verify/ProfileQ/TimeQ/ShowQ). */
object Runners {

  /** Process-unique warehouse dir, deleted on JVM exit. Queries that stage
    * MANAGED tables (q120/q127/q150/q165... incremental/MV/time-travel
    * paths) use fixed table names, so two concurrent runner JVMs sharing
    * ./spark-warehouse would race on the same table directories (observed:
    * a concurrent sf0.001 Verify corrupting a sf0.1 Verify's q127 history).
    * The shutdown-hook delete keeps repeated sf10 runs from leaking GBs of
    * managed-table data under /tmp per invocation. */
  def tempWarehouse(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-wh")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    dir.toString
  }

  /** Parse `SPARK_GRAFT_BENCH_BASELINE` (comma-separated per-query JSON
    * files — previous canonical suites / same-day runs) into the best
    * reference time per query. Shared by Bench's sf0.1 self-consistency
    * gate and TimeQ's sf10 gate. A silently-disabled gate is invisible in
    * the artifact, so every missing file — and an empty parse despite the
    * env var being set — warns on stderr. */
  def parseBenchBaseline(): Map[String, Double] = {
    val qTime = """\"(q[0-9]+[A-Za-z0-9_]*)\":([0-9]+(?:\.[0-9]+)?)""".r
    sys.env.get("SPARK_GRAFT_BENCH_BASELINE").map { spec =>
      val parsed = spec.split(',').toSeq.flatMap { p =>
        val path = java.nio.file.Paths.get(p)
        if (!java.nio.file.Files.exists(path)) {
          System.err.println(
            s"[bench] WARNING: baseline file '$p' does not exist — " +
              "the self-consistency gate is NOT using it")
          Seq.empty
        } else {
          val text = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
          qTime.findAllMatchIn(text).map(m => m.group(1) -> m.group(2).toDouble).toSeq
        }
      }
      if (parsed.isEmpty)
        System.err.println(
          "[bench] WARNING: SPARK_GRAFT_BENCH_BASELINE is set but no " +
            "per-query times parsed — the self-consistency gate is DISABLED")
      parsed.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    }.getOrElse(Map.empty)
  }

  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file._
    import java.nio.file.attribute.BasicFileAttributes
    if (Files.exists(p)) Files.walkFileTree(p, new SimpleFileVisitor[Path] {
      override def visitFile(f: Path, a: BasicFileAttributes) = {
        Files.deleteIfExists(f); FileVisitResult.CONTINUE
      }
      override def postVisitDirectory(d: Path, e: java.io.IOException) = {
        Files.deleteIfExists(d); FileVisitResult.CONTINUE
      }
    })
  }
}
