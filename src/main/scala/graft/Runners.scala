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
