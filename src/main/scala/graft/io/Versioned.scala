package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal snapshot-versioned parquet table — the table-format kernel
  * (Delta/Iceberg's core idea) expressed engine-side: data files are
  * IMMUTABLE once written, and a numbered manifest log defines exactly the
  * files belonging to each version. Readers resolve the log, never a
  * directory listing, so:
  *  - time travel = resolve an old version (q165);
  *  - snapshot isolation = a reader holding version N is untouched by any
  *    later commit (new files are invisible until their manifest lands);
  *  - commits are atomic at the manifest-file level (staging write +
  *    CREATE-NEW hard link), the same unit every real table format relies
  *    on.
  *
  * SCALE MODEL — delta-log + checkpoints (the Delta Lake shape): each
  * commit's manifest records only that commit's CHANGES (`+entry` adds,
  * `-path` removes), so commit cost is O(files touched), never O(table
  * files) — at ~10⁶ files (100 TB) an append writes a few lines, not a
  * corpus-sized snapshot. Every [[checkpointInterval]] versions a
  * CHECKPOINT file materializes the full resolved entry list; snapshot
  * resolution reads latest-checkpoint-≤-v plus the delta tail, so read
  * cost is O(table files + interval·Δ) once, not O(versions · files).
  * [[lastResolveCost]] exposes the work each resolution actually did —
  * VersionedSpec gates the bound so an O(chain) read path can't silently
  * return.
  *
  * Layout: `<table>/data/c<N>/part-*.parquet` per commit,
  * `<table>/_versions/<N>` = the version's manifest,
  * `<table>/_versions/<N>.ckpt` = full entry-list checkpoint. An entry is
  * a data DIR (whole-commit grain — append/overwrite commits) or an
  * individual parquet FILE (the grain [[deleteWhere]] and
  * [[compactSmallFiles]] need to retire a file subset while older
  * versions keep resolving it), optionally carrying a PARTITION VALUE
  * ([[commitPartitioned]] — [[snapshotWhere]] then prunes files from the
  * manifest alone, the Delta/Iceberg metadata-pruning model the zb=/cell=
  * layouts compose with) and per-file MIN/MAX STATS (read from parquet
  * FOOTERS at commit time — no extra data scan; [[snapshotRange]] prunes
  * by them). A `#tag=` header line records an idempotency tag atomically
  * with the commit (the streaming sink's exactly-once epoch boundary);
  * a `#ts=` header records the commit wall-clock, the retention clock
  * [[vacuum]] trusts (file mtimes don't survive object-store copies).
  *
  * MAINTENANCE AS COMMITS (the transactional counterpart of
  * [[Deletes]]/[[Compaction]]'s directory-swap operations): a versioned
  * delete or compaction writes ONLY NEW files and lands a delta manifest
  * removing exactly the entries it retired — no live file is ever renamed
  * or removed, so a reader pinned to version N sees identical results
  * before, during, and after the operation, and a crash mid-operation
  * leaves at worst an orphaned data dir that [[vacuum]] clears. Physical
  * removal of retired files is deferred to [[vacuum]], the explicit
  * retention boundary. */
object Versioned {

  private def versionsDir(table: String) = Paths.get(table, "_versions")

  /** Every `Files.list`/`Files.walk` call site drains the stream into a
    * materialized Seq inside try/finally close — the NIO streams hold a
    * directory file descriptor until closed, and the streaming sinks run
    * this machinery every micro-batch for the lifetime of the ingest, so
    * leaking one FD per call is an exhaustion bug, not a style nit. */
  private def listDir(d: Path): Seq[Path] = {
    val s = Files.list(d)
    try s.iterator().asScala.toSeq finally s.close()
  }

  private def walkDir(d: Path): Seq[Path] = {
    val s = Files.walk(d)
    try s.iterator().asScala.toSeq finally s.close()
  }

  // --- manifest line format ---
  //
  // A manifest is newline-separated lines:
  //   #key=value                  header (e.g. `#ts=` commit epoch-millis,
  //                               `#tag=` idempotency tag); never a path
  //   #delta                      marks a DELTA manifest: body lines are
  //                               `+<entry>` (add) / `-<path>` (remove
  //                               every resolved entry with that path)
  //   <entry>                     (no `#delta` header) a FULL manifest —
  //                               the body REPLACES the resolved list
  //                               (overwrite commits; pre-delta-format
  //                               manifests read unchanged)
  //
  // An entry line is `path` plus tab-separated `key=value` metadata
  // fields: a plain `col=value` pair is the file's PARTITION value
  // ([[commitPartitioned]]) recorded UNESCAPED (the raw value, not
  // Spark's Hive-escaped dir segment — [[snapshotWhere]] compares raw
  // caller values); an `s:col=min..max` pair is a FILE STAT (long-valued
  // inclusive range — the Delta/Iceberg data-skipping model:
  // [[snapshotRange]] prunes files whose range cannot intersect a
  // predicate, no footer reads at read time, no directory listing).
  // [[landManifest]] VALIDATES every line at write time (no tabs in
  // paths, no '='-less metadata, no '#'/'+'/'-'-leading paths), so a
  // malformed manifest fails loudly at commit, never as an opaque parse
  // error at read.
  private def parseEntryAll(line: String): (String, Seq[(String, String)]) = {
    val parts = line.split('\t')
    (parts.head, parts.tail.toSeq.map { meta =>
      val eq = meta.indexOf('=')
      if (eq < 0) throw new IllegalArgumentException(
        s"malformed manifest entry (metadata field without '='): $line")
      (meta.substring(0, eq), meta.substring(eq + 1))
    })
  }

  private def parseEntry(line: String): (String, Option[(String, String)]) = {
    val (path, metas) = parseEntryAll(line)
    (path, metas.find(!_._1.startsWith("s:")))
  }

  private def formatEntryAll(path: String,
                             metas: Seq[(String, String)]): String =
    (path +: metas.map { case (k, v) => s"$k=$v" }).mkString("\t")

  private def entryPath(line: String): String = {
    val t = line.indexOf('\t')
    if (t < 0) line else line.substring(0, t)
  }

  /** Latest LANDED version — claim files (`<v>.claim`), checkpoints and
    * staging names are ignored, so an in-flight or crashed commit never
    * changes what readers resolve. */
  def latestVersion(table: String): Int = {
    val d = versionsDir(table)
    if (!Files.exists(d)) 0
    else listDir(d)
      .map(_.getFileName.toString)
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toInt).foldLeft(0)(math.max)
  }

  /** OPTIMISTIC CONCURRENCY for the manifest log: atomically claim the
    * next version number via `Files.createFile` (CREATE_NEW semantics —
    * exactly one writer wins each number; a loser advances and retries),
    * so two concurrent commits can never both land the same manifest
    * with one silently replacing the other (rename(2) overwrites — the
    * single-writer caveat this removes). A claim whose writer dies
    * before landing leaves a numbered gap; [[awaitPredecessor]] bounds
    * how long a successor waits for it before failing loudly. */
  private def claimVersion(table: String): Int = {
    Files.createDirectories(versionsDir(table))
    var v = latestVersion(table) + 1
    while (true) {
      // also skip numbers another writer has claimed but not landed
      if (!Files.exists(versionsDir(table).resolve(v.toString))) {
        try {
          Files.createFile(versionsDir(table).resolve(s"$v.claim"))
          return v
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => ()
        }
      }
      v += 1
    }
    v // unreachable
  }

  /** Default bound on how long a commit waits for its predecessor's
    * manifest to land; override per commit for workloads whose single
    * commits legitimately run long (a large rewrite at real scale). */
  val defaultPredecessorTimeoutMs: Long = 120000L

  /** Wait for manifest v-1 to land (the claimer ahead of us is writing
    * its data files). A dead predecessor would hang the log, so the wait
    * is bounded: on timeout the commit FAILS LOUDLY (releasing its own
    * claim) rather than landing a manifest that silently omits the
    * predecessor's rows. */
  private def awaitPredecessor(table: String, v: Int,
                               timeoutMs: Long): Unit = {
    if (v == 1) return
    val prev = versionsDir(table).resolve((v - 1).toString)
    val t0 = System.nanoTime()
    while (!Files.exists(prev)) {
      if ((System.nanoTime() - t0) / 1000000 > timeoutMs)
        throw new IllegalStateException(
          s"manifest ${v - 1} of $table has not landed within $timeoutMs " +
            "ms of being claimed. If that writer is STILL RUNNING (a " +
            "slow large commit), retry with a larger " +
            "predecessorTimeoutMs — do NOT remove its claim file. Only " +
            s"after confirming the writer is dead: verify data/c${v - 1} " +
            "is orphaned, remove both, and retry — removing a LIVE " +
            "writer's claim lets two commits land the same version, " +
            "silently dropping one")
      Thread.sleep(50)
    }
  }

  private def manifestLines(table: String, v: Int): Seq[String] = {
    val p = versionsDir(table).resolve(v.toString)
    if (!Files.exists(p))
      throw new IllegalStateException(
        s"manifest $v of $table is missing — the version is below the " +
          "vacuum retention boundary (time travel there is declared gone) " +
          "or never landed")
    Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
  }

  // --- snapshot resolution: checkpoint + delta tail ---

  /** Versions between checkpoints. Every commit landing a version
    * divisible by this writes `<v>.ckpt` (full resolved entry list) after
    * its manifest, so resolution work is bounded by one checkpoint plus
    * at most this many delta manifests regardless of chain length. The
    * checkpoint write is BEST-EFFORT (derivable, idempotent — identical
    * content for a given version): a crash between manifest and
    * checkpoint just lengthens the next reader's tail. */
  val checkpointInterval: Int = 16

  /** Work the most recent [[resolvedEntries]] call did — the CI hook for
    * the O(checkpoint + tail) read bound (VersionedSpec asserts
    * `manifestsRead <= checkpointInterval` over a long commit chain; a
    * full-chain parse fails the gate). */
  private[graft] final case class ResolveCost(manifestsRead: Int,
                                              linesParsed: Long,
                                              checkpointUsed: Option[Int])
  @volatile private[graft] var lastResolveCost: ResolveCost =
    ResolveCost(0, 0L, None)

  private def checkpointPath(table: String, v: Int): Path =
    versionsDir(table).resolve(s"$v.ckpt")

  /** Newest landed checkpoint at or below `v`, if any. */
  private def latestCheckpointAtOrBelow(table: String, v: Int): Option[Int] = {
    val d = versionsDir(table)
    if (!Files.exists(d)) return None
    listDir(d).map(_.getFileName.toString)
      .filter(_.endsWith(".ckpt"))
      .map(_.stripSuffix(".ckpt"))
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toInt).filter(_ <= v)
      .maxOption
  }

  /** The full entry list of version `v`: nearest checkpoint ≤ v, then the
    * delta manifests of the tail applied in order (a FULL manifest in the
    * tail — an overwrite commit or a pre-delta-format manifest — replaces
    * the list). This is the ONLY resolution path; every read and every
    * maintenance commit goes through it, so the cost gate above covers
    * them all. */
  private def resolvedEntries(table: String, v: Int): Seq[String] = {
    var manifests = 0
    var lines = 0L
    val ckpt = latestCheckpointAtOrBelow(table, v)
    var entries: Vector[String] = ckpt match {
      case Some(k) =>
        val ls = Files.readAllLines(checkpointPath(table, k),
          StandardCharsets.UTF_8).asScala.toVector
          .filter(l => l.nonEmpty && !l.startsWith("#"))
        lines += ls.size
        ls
      case None => Vector.empty
    }
    var j = ckpt.getOrElse(0) + 1
    while (j <= v) {
      val ls = manifestLines(table, j)
      manifests += 1
      lines += ls.size
      val isDelta = ls.contains("#delta")
      val body = ls.filterNot(l => l.startsWith("#") || l.isEmpty)
      if (isDelta) {
        val removes = body.collect { case l if l.startsWith("-") =>
          l.substring(1) }.toSet
        val adds = body.collect { case l if l.startsWith("+") =>
          l.substring(1) }
        entries =
          (if (removes.isEmpty) entries
           else entries.filterNot(e => removes.contains(entryPath(e)))) ++ adds
      } else entries = body.toVector
      j += 1
    }
    lastResolveCost = ResolveCost(manifests, lines, ckpt)
    entries
  }

  /** Per-prefix maxima of NUMERIC-suffixED tags recorded in checkpoint
    * `k` (the `#maxtag=<prefix>\t<n>` header lines) — present exactly
    * when the `#tags-recorded` marker is (older checkpoints without it
    * force [[latestTaggedSuffix]]'s full-chain fallback). */
  private def checkpointTagMaxima(table: String,
                                  k: Int): Option[Map[String, Long]] = {
    val ls = Files.readAllLines(checkpointPath(table, k),
      StandardCharsets.UTF_8).asScala
    if (!ls.contains("#tags-recorded")) None
    else Some(ls.filter(_.startsWith("#maxtag=")).map { l =>
      val body = l.stripPrefix("#maxtag=")
      val t = body.lastIndexOf('\t')
      body.substring(0, t) -> body.substring(t + 1).toLong
    }.toMap)
  }

  /** Split a numeric-suffixed tag into (prefix incl. separator, value) —
    * "epoch:7" → ("epoch:", 7). Non-numeric-suffixed tags yield None and
    * are never folded into maxima. */
  private def tagSplit(tag: String): Option[(String, Long)] = {
    val i = tag.lastIndexWhere(!_.isDigit)
    if (i == tag.length - 1) None
    else tag.substring(i + 1).toLongOption.map((tag.substring(0, i + 1), _))
  }

  /** Write the checkpoint for version `v` (full resolved entry list,
    * plus the running per-prefix tag maxima so [[latestTaggedSuffix]]
    * stays checkpoint+tail-bounded), atomically via temp + move. Safe to
    * call concurrently or repeatedly: the content is a pure function of
    * the version. */
  private def writeCheckpoint(table: String, v: Int): Unit = {
    val entries = resolvedEntries(table, v)
    // tag maxima: previous RECORDING checkpoint's maxima + the tags of
    // the manifests after it (full-chain fold when no prior recording —
    // once, after which every later checkpoint is incremental)
    val prevCkpt = latestCheckpointAtOrBelow(table, v - 1)
    val base = prevCkpt.flatMap(checkpointTagMaxima(table, _))
    val from = if (base.isDefined) prevCkpt.get + 1 else 1
    val folded = (from to v).foldLeft(base.getOrElse(Map.empty[String, Long])) {
      (m, k) =>
        if (!Files.exists(versionsDir(table).resolve(k.toString))) m
        else versionTag(table, k).flatMap(tagSplit) match {
          case Some((p, n)) => m.updated(p, math.max(m.getOrElse(p, n), n))
          case None => m
        }
    }
    val target = checkpointPath(table, v)
    val staging = versionsDir(table).resolve(
      s"$v.ckpt.staging.${java.util.UUID.randomUUID().toString.take(8)}")
    val headers = "#tags-recorded" +:
      folded.toSeq.sorted.map { case (p, n) => s"#maxtag=$p\t$n" }
    Files.write(staging,
      (headers ++ entries).mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING): Unit
  }

  private def maybeCheckpoint(table: String, v: Int): Unit =
    if (v % checkpointInterval == 0)
      try writeCheckpoint(table, v)
      catch { case _: Exception => () } // derivable; next reader's tail grows

  /** The idempotency tag recorded in version `v`'s manifest header, if
    * any — landed atomically WITH the entry list (one file, one
    * CREATE-NEW link), so a tag can never exist without its commit or
    * vice versa. */
  def versionTag(table: String, v: Int): Option[String] =
    manifestLines(table, v).find(_.startsWith("#tag="))
      .map(_.stripPrefix("#tag="))

  /** The commit wall-clock of version `v` (epoch millis) — the `#ts=`
    * header [[landManifest]] stamps, falling back to the manifest file's
    * mtime for pre-format manifests. [[vacuum]]'s time retention keys off
    * THIS, not the filesystem: mtimes don't survive object-store copies
    * or backup restores, the commit header does. */
  def versionTimestamp(table: String, v: Int): Long =
    manifestLines(table, v).find(_.startsWith("#ts="))
      .flatMap(_.stripPrefix("#ts=").toLongOption)
      .getOrElse(Files.getLastModifiedTime(
        versionsDir(table).resolve(v.toString)).toMillis)

  /** The TABLE SCHEMA as of version `v` — the `#schema=` header each
    * commit stamps (the schema the snapshot read applies, so files
    * written BEFORE a column was added read the column as NULL instead
    * of the read schema depending on which file the reader sampled).
    * None for pre-format manifests (reads fall back to parquet
    * inference, the pre-r15 behavior). */
  def versionSchema(table: String, v: Int)
      : Option[org.apache.spark.sql.types.StructType] =
    manifestLines(table, v).find(_.startsWith("#schema="))
      .map(s => org.apache.spark.sql.types.DataType
        .fromJson(s.stripPrefix("#schema="))
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** Largest numeric suffix among landed tags with the given prefix
    * (e.g. prefix "epoch:" over tags "epoch:7") — the streaming sink's
    * replay boundary, resolved ONCE at stream (re)start. Tags whose
    * suffix is not a number are SKIPPED (an operator-written "epoch:final"
    * must not kill stream startup).
    *
    * CHECKPOINT+TAIL bounded, like snapshot resolution: checkpoints
    * record the running per-prefix maxima (`#maxtag=` headers), so a
    * stream restarting on a 10⁵-epoch table opens one checkpoint plus at
    * most [[checkpointInterval]] manifests — not the whole chain — AND
    * the maxima survive vacuum (a tag whose manifest was dropped below
    * retention is still counted from the retained checkpoint, so the
    * exactly-once replay boundary holds across restarts regardless of
    * retention). `prefix` must end exactly where the numeric suffix
    * begins (the maxima are keyed that way). Pre-maxima checkpoints fall
    * back to the full chain scan. */
  def latestTaggedSuffix(table: String, prefix: String): Option[Long] = {
    val v = latestVersion(table)
    if (v < 1) return None
    val ckpt = latestCheckpointAtOrBelow(table, v)
    val maxima = ckpt.flatMap(checkpointTagMaxima(table, _))
    val from = if (maxima.isDefined) ckpt.get + 1 else 1
    val tail = (from to v).iterator
      .filter(k => Files.exists(versionsDir(table).resolve(k.toString)))
      .flatMap(k => versionTag(table, k))
      .filter(_.startsWith(prefix))
      .flatMap(_.stripPrefix(prefix).toLongOption)
    (maxima.flatMap(_.get(prefix)).iterator ++ tail)
      .foldLeft(Option.empty[Long])((m, x) => Some(math.max(m.getOrElse(x), x)))
  }

  /** Version numbers of all claim files currently present. */
  private def claimNumbers(table: String): Seq[Int] =
    listDir(versionsDir(table))
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".claim") &&
        n.stripSuffix(".claim").nonEmpty &&
        n.stripSuffix(".claim").forall(_.isDigit))
      .map(_.stripSuffix(".claim").toInt).sorted

  /** Reject a body line the parser could not round-trip — called at LAND
    * time so a path with a tab, an '='-less metadata field, or a
    * prefix-ambiguous path fails the commit loudly instead of corrupting
    * the log for every later reader. */
  private def validateBodyLine(raw: String, delta: Boolean): Unit = {
    val line =
      if (delta) {
        require(raw.startsWith("+") || raw.startsWith("-"),
          s"delta manifest body line must start with +/-: $raw")
        raw.substring(1)
      } else raw
    if (delta && raw.startsWith("-")) {
      require(line.nonEmpty && !line.contains('\t'),
        s"malformed remove line (empty or tabbed path): $raw")
      return
    }
    val (path, _) = parseEntryAll(line) // throws on '='-less metadata
    require(path.nonEmpty, s"empty path in manifest entry: $raw")
    require(!path.startsWith("#") && !path.startsWith("+") &&
      !path.startsWith("-"),
      s"manifest entry path may not start with '#', '+' or '-': $raw")
  }

  /** Land manifest `v` atomically and CREATE-NEW: the full content goes
    * to a PER-WRITER staging name (a shared name would let one racer
    * truncate another's bytes mid-move), then a hard link claims the
    * target — link(2) fails atomically if the target exists, so even two
    * writers holding the same number (an operator cleared a LIVE
    * writer's claim) can never silently replace a landed manifest; the
    * loser gets a loud error. A reader never observes a partial
    * manifest; a crash mid-land leaves only a staging file. Every line
    * is VALIDATED here (format constraints enforced at write, not
    * discovered as parse errors at read). */
  private def landManifest(table: String, v: Int,
                           lines: Seq[String]): Unit = {
    val delta = lines.contains("#delta")
    lines.foreach { l =>
      if (!l.startsWith("#") && l.nonEmpty) validateBodyLine(l, delta)
    }
    Files.createDirectories(versionsDir(table))
    val target = versionsDir(table).resolve(v.toString)
    val staging = versionsDir(table).resolve(
      s"$v.staging.${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(staging,
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    try Files.createLink(target, staging)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(staging)
        throw new IllegalStateException(
          s"manifest $v of $table already exists — refusing to replace a " +
            "landed commit (was a live writer's claim file removed?)")
    }
    Files.deleteIfExists(staging): Unit
  }

  /** Release a claimed version after an IN-PROCESS failure: remove the
    * partial data dir (best-effort) and the claim file, so the number can
    * be re-claimed and the log never wedges on a failed write — a
    * successor blocked in [[awaitPredecessor]] unblocks as soon as a new
    * writer re-claims and lands the number. (A hard JVM crash still
    * leaks its claim; the awaitPredecessor error documents the manual
    * recovery.)
    *
    * If manifest `v` EXISTS, the data dir is NOT touched: that means a
    * second writer held the same number (a cleared live claim) and
    * LANDED it — this writer's failure must not destroy the directory
    * that landed manifest references. */
  private def abandonClaim(table: String, v: Int, dataDir: Path): Unit = {
    val landed = Files.exists(versionsDir(table).resolve(v.toString))
    try {
      if (!landed && Files.exists(dataDir))
        walkDir(dataDir).reverse
          .foreach(f => Files.deleteIfExists(f): Unit)
    } catch { case _: Exception => () } // best-effort; vacuum sweeps later
    Files.deleteIfExists(versionsDir(table).resolve(s"$v.claim")): Unit
  }

  /** Every (parquet file, metadata fields) pair a manifest entry
    * resolves to, absolute paths (dir entries enumerate their current
    * listing; immutability of committed dirs makes that deterministic
    * until [[vacuum]]). Dir-grain entries carry no metadata. */
  private def expandEntryAll(entry: String): Seq[(String, Seq[(String, String)])] = {
    val (path, metas) = parseEntryAll(entry)
    val p = Paths.get(path)
    if (Files.isDirectory(p))
      walkDir(p)
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .map(f => (f.toAbsolutePath.toString, Seq.empty[(String, String)]))
        .sortBy(_._1)
    else Seq((p.toAbsolutePath.toString, metas))
  }

  private def expandEntry(entry: String): Seq[(String, Option[(String, String)])] =
    expandEntryAll(entry).map { case (f, metas) =>
      (f, metas.find(!_._1.startsWith("s:")))
    }

  private def expandFiles(entry: String): Seq[String] =
    expandEntryAll(entry).map(_._1)

  /** Per-file long-valued min/max for `cols` read from the parquet
    * FOOTERS — zero data-scan cost (the footers already hold per-chunk
    * statistics; re-reading every ingested byte to recompute them is the
    * anti-pattern this replaces). Per file: min of chunk minima / max of
    * chunk maxima over all row groups; a chunk with MISSING statistics
    * makes the whole file stat-less for that column (conservative — the
    * file is then always kept by [[snapshotRange]]); all-null chunks
    * contribute nothing; an all-null file yields no stat. INT32/INT64
    * primitive columns only (integral keys, epoch days/millis, z-values
    * — the long-valued contract `s:` ranges encode). */
  private[io] def footerStats(conf: org.apache.hadoop.conf.Configuration,
      files: Seq[String],
      cols: Seq[String]): Map[String, Seq[(String, String)]] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    if (cols.isEmpty || files.isEmpty) return Map.empty
    files.map { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f), conf))
      val blocks =
        try reader.getFooter.getBlocks.asScala.toSeq
        finally reader.close()
      f -> cols.flatMap { c =>
        // (min, max) per chunk; None for an all-null chunk; the whole
        // column drops to stat-less on any unusable chunk
        val perChunk: Seq[Option[Option[(Long, Long)]]] = blocks.map { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == c) match {
            case None => None // column absent from this file's schema
            case Some(chunk) =>
              val st = chunk.getStatistics
              if (st == null || st.isEmpty) None // stats not written
              else if (!st.hasNonNullValue) {
                if (st.isNumNullsSet && st.getNumNulls == chunk.getValueCount)
                  Some(None) // provably all-null chunk: contributes nothing
                else None    // can't prove all-null: unusable
              } else chunk.getPrimitiveType.getPrimitiveTypeName match {
                case PrimitiveTypeName.INT64 => Some(Some((
                  st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                  st.genericGetMax.asInstanceOf[java.lang.Long].longValue())))
                case PrimitiveTypeName.INT32 => Some(Some((
                  st.genericGetMin.asInstanceOf[java.lang.Integer].longValue(),
                  st.genericGetMax.asInstanceOf[java.lang.Integer].longValue())))
                case _ => None // non-integral physical type: no s: range
              }
          }
        }
        if (perChunk.exists(_.isEmpty)) Nil
        else {
          val ranges = perChunk.flatten.flatten
          if (ranges.isEmpty) Nil // all-null file
          else Seq((s"s:$c",
            s"${ranges.map(_._1).min}..${ranges.map(_._2).max}"))
        }
      }
    }.toMap
  }

  /** Manifest lines for a freshly written commit dir: file grain when
    * partition metadata or stats are requested (each line carrying the
    * UNESCAPED `partCol=value` decoded from its `__pv=` dir segment, and
    * `s:col=min..max` ranges from the parquet footers), dir grain
    * otherwise. */
  private def commitEntries(spark: SparkSession, dataDir: Path,
      partCol: Option[String], statsCols: Seq[String]): Seq[String] = {
    if (partCol.isEmpty && statsCols.isEmpty) return Seq(dataDir.toString)
    val files = walkDir(dataDir)
      .filter(f => Files.isRegularFile(f) &&
        f.getFileName.toString.endsWith(".parquet"))
      .map(_.toAbsolutePath).sortBy(_.toString)
    val stats = footerStats(spark.sparkContext.hadoopConfiguration,
      files.map(_.toString), statsCols)
    files.map { f =>
      val part = partCol.map { c =>
        val seg = f.getParent.getFileName.toString
        require(seg.startsWith(partDirCol + "="),
          s"partitioned commit file $f not under a $partDirCol= dir")
        // store the RAW value: Spark Hive-escapes special characters
        // (space, ':', '/') into the dir segment — recording the escaped
        // form would make snapshotWhere(raw value) silently prune
        // matching files (the ADVICE-r14 finding)
        (c, org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(seg.stripPrefix(partDirCol + "=")))
      }
      formatEntryAll(f.toString,
        part.toSeq ++ stats.getOrElse(f.toString, Nil))
    }
  }

  private def fileOfUri(uri: String): String =
    Paths.get(new java.net.URI(uri)).toAbsolutePath.toString

  /** Append `df` as a new commit; returns the new version number.
    * `overwrite = true` starts the file list fresh (replace semantics —
    * lands a FULL manifest; appends land DELTA manifests whose size is
    * O(files in this commit), independent of table size).
    *
    * Concurrency: the version number is CLAIMED atomically before any
    * write; concurrent appends serialize into consecutive versions, each
    * resolving to all prior commits plus its own; none is ever silently
    * replaced (VersionedSpec races N threads and checks every commit's
    * rows survive into the final snapshot).
    *
    * `statsCols`: record per-file min/max (long-valued) for these columns
    * in the manifest — [[snapshotRange]] then prunes FILES by range
    * predicate from metadata alone (the Delta/Iceberg data-skipping
    * model). Entries switch to file grain when stats are requested; the
    * ranges come from the parquet FOOTERS (no post-write data scan). */
  def commit(df: DataFrame, table: String, overwrite: Boolean = false,
             predecessorTimeoutMs: Long = defaultPredecessorTimeoutMs,
             tag: Option[String] = None,
             statsCols: Seq[String] = Nil): Int = {
    val guarded = checkGuard(df, table)
    commitWith(table, overwrite, predecessorTimeoutMs, tag,
      df.schema) { dataDir =>
      guarded.write.parquet(dataDir.toString)
      commitEntries(df.sparkSession, dataDir, None, statsCols)
    }
  }

  /** Append `df` as a new commit whose manifest entries carry PARTITION
    * METADATA: the commit dir is written Hive-partitioned on an internal
    * copy of `partCol` (so every data file RETAINS the original column),
    * and each file's manifest line records its `partCol=value` (raw —
    * dir-segment escaping is decoded). Reads via [[snapshotWhere]] then
    * prune FILES from the manifest alone — no directory listing, no
    * Hive-layout coupling — which is what lets the zb=/cell= layouts
    * ([[Layout]], `Similarity`) commit appends and maintenance as
    * snapshot-isolated versions instead of directory swaps. NULL and
    * EMPTY-STRING partition values abort the write (both would vanish
    * into Hive's default partition and silently miss every pruned read —
    * the same guard as the z-layout's). */
  def commitPartitioned(df: DataFrame, table: String, partCol: String,
      overwrite: Boolean = false,
      predecessorTimeoutMs: Long = defaultPredecessorTimeoutMs,
      tag: Option[String] = None,
      statsCols: Seq[String] = Nil): Int = {
    val guarded = checkGuard(df, table)
    commitWith(table, overwrite, predecessorTimeoutMs, tag,
      df.schema) { dataDir =>
      guarded.withColumn(partDirCol,
          when(col(partCol).isNull || col(partCol).cast("string") === "",
            raise_error(lit(
              s"NULL or empty-string $partCol — either would land in " +
                "Hive's default partition and vanish from every pruned " +
                "snapshot read")))
            .otherwise(col(partCol).cast("string")))
        .write.partitionBy(partDirCol).parquet(dataDir.toString)
      commitEntries(df.sparkSession, dataDir, Some(partCol), statsCols)
    }
  }

  /** The internal Hive-dir column [[commitPartitioned]] writes — a COPY
    * of the caller's partition column, so the original stays IN the data
    * files (manifest-pruned reads never reconstruct columns from paths). */
  private val partDirCol = "__pv"

  /** Top-level fields forced nullable — the schema the `#schema=` header
    * records. Spark's parquet READ path converts every top-level column
    * to nullable for compatibility, so recording the writer's exact
    * nullability would make evolved reads differ from inferred ones for
    * no semantic gain (and files written before a column existed read it
    * as NULL regardless). */
  private def asNullable(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      s.fields.map(_.copy(nullable = true)))

  // --- CHECK constraints: table-level row invariants ---

  /** The CHECK constraints in force at version `v` — `#check=<name>\t
    * <sql expr>` headers, carried forward by every commit like the
    * schema. SQL CHECK semantics: a row violates a check only when the
    * expression evaluates to FALSE (NULL passes). */
  def tableChecks(table: String, v: Int): Seq[(String, String)] =
    if (v < 1) Nil
    else manifestLines(table, v).filter(_.startsWith("#check=")).map { l =>
      val body = l.stripPrefix("#check=")
      val t = body.indexOf('\t')
      (body.substring(0, t), body.substring(t + 1))
    }

  private def checkHeaders(checks: Seq[(String, String)]): Seq[String] =
    checks.map { case (n, e) => s"#check=$n\t$e" }

  /** Fuse constraint validation INTO the commit's own write (no extra
    * pass): the first written column is wrapped so any violating row
    * aborts the write task with the check's name — the same fused
    * raise_error shape as the partition NULL guard. Applied against the
    * LATEST LANDED version's checks at call time (a check landed
    * concurrently with an in-flight commit applies from the next commit
    * — the single-writer discipline every other maintenance facility
    * assumes). */
  private def checkGuard(df: DataFrame, table: String): DataFrame = {
    val checks = tableChecks(table, latestVersion(table))
    if (checks.isEmpty || df.columns.isEmpty) return df
    val violated = checks.map { case (n, e) =>
      (n, !coalesce(expr(e), lit(true)))
    }
    val c0 = df.columns.head
    val guard = violated.foldRight(col(c0)) { case ((n, bad), acc) =>
      when(bad, raise_error(concat(
        lit(s"CHECK constraint '$n' violated by row: "),
        to_json(struct(df.columns.map(col): _*)))))
        .otherwise(acc)
    }
    df.withColumn(c0, guard)
  }

  /** ADD a CHECK constraint — a metadata-only commit. The EXISTING table
    * must already satisfy it (one validating scan, like Delta's ADD
    * CONSTRAINT); every later commit/merge validates incoming rows
    * against it inside the write itself. Returns the new version. */
  def addCheck(spark: SparkSession, table: String, name: String,
               sqlExpr: String): Int = {
    require(name.nonEmpty && !name.contains('\t') && !sqlExpr.contains('\t')
      && !name.contains('\n') && !sqlExpr.contains('\n'),
      "check name/expr may not contain tabs or newlines")
    val v = latestVersion(table)
    require(v >= 1, s"no commits in $table")
    require(!tableChecks(table, v).exists(_._1 == name),
      s"check '$name' already exists on $table")
    val bad = snapshot(spark, table, v)
      .where(!coalesce(expr(sqlExpr), lit(true))).limit(1).collect()
    require(bad.isEmpty,
      s"existing rows of $table violate CHECK '$name' ($sqlExpr): " +
        s"e.g. ${bad.headOption.getOrElse("")}")
    landCheckCommit(table, v, tableChecks(table, v) :+ (name -> sqlExpr))
  }

  /** DROP a CHECK constraint by name — a metadata-only commit. */
  def dropCheck(table: String, name: String): Int = {
    val v = latestVersion(table)
    require(v >= 1, s"no commits in $table")
    require(tableChecks(table, v).exists(_._1 == name),
      s"no check '$name' on $table")
    landCheckCommit(table, v,
      tableChecks(table, v).filterNot(_._1 == name))
  }

  /** Land a metadata-only commit (empty delta body) whose headers carry
    * the predecessor's schema plus the given check set. */
  private def landCheckCommit(table: String, base: Int,
                              checks: Seq[(String, String)]): Int = {
    val nv = claimMaintenance(table, base)
    try landManifest(table, nv,
      Seq(s"#ts=${System.currentTimeMillis()}") ++
        versionSchema(table, base).map(s => s"#schema=${s.json}") ++
        checkHeaders(checks) ++ Seq("#delta"))
    catch {
      case t: Throwable =>
        Files.deleteIfExists(versionsDir(table).resolve(s"$nv.claim"))
        throw t
    }
    Files.deleteIfExists(versionsDir(table).resolve(s"$nv.claim"))
    maybeCheckpoint(table, nv)
    nv
  }

  /** Recursive nullability-normalized type — the COMPARISON form for
    * append compatibility: nested containsNull/valueContainsNull flags
    * differ between write-side casts and read-side inference without any
    * semantic difference, and must not fail an append. */
  private def normType(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        StructField(f.name, normType(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(normType(a.elementType), true)
      case m: MapType =>
        MapType(normType(m.keyType), normType(m.valueType), true)
      case o => o
    }
  }

  /** SCHEMA EVOLUTION + ENFORCEMENT for an append: every column of the
    * predecessor's schema must be present with the SAME type (a missing
    * or retyped column fails LOUDLY — the silent alternative is a table
    * whose read schema depends on which file the reader samples); NEW
    * columns are allowed and appended AFTER the existing ones, so column
    * order stays stable as the table evolves. Returns the schema to
    * record for this version. No predecessor schema (pre-format table,
    * or v == 1/overwrite) records the frame's own schema. */
  private def evolvedSchema(prev: Option[org.apache.spark.sql.types.StructType],
      next: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = prev match {
    case None => asNullable(next)
    case Some(p) =>
      val nextByName = next.fields.map(f => f.name -> f).toMap
      p.fields.foreach { f =>
        val cur = nextByName.get(f.name)
        require(cur.isDefined,
          s"incompatible append: column '${f.name}' (${f.dataType.sql}) " +
            "is missing from the appended frame — the table schema only " +
            "grows; drop columns via an explicit overwrite commit")
        require(normType(cur.get.dataType) == normType(f.dataType),
          s"incompatible append: column '${f.name}' retyped " +
            s"${f.dataType.sql} -> ${cur.get.dataType.sql}")
      }
      val added = next.fields.filterNot(f => p.fieldNames.contains(f.name))
      asNullable(org.apache.spark.sql.types.StructType(p.fields ++ added))
  }

  /** Shared claim → write → land skeleton of [[commit]] /
    * [[commitPartitioned]]; `write` produces the new manifest entries.
    * Lands a DELTA manifest (adds only) unless overwriting — the commit
    * never reads, rewrites, or re-parses the predecessor's entry list,
    * which is the O(ΔF) commit-cost contract. The LOGICAL schema lands
    * as a `#schema=` header (checked/evolved against the predecessor's
    * — see [[evolvedSchema]]), so every version knows its own read
    * schema. */
  private def commitWith(table: String, overwrite: Boolean,
      predecessorTimeoutMs: Long, tag: Option[String],
      schema: org.apache.spark.sql.types.StructType)
      (write: Path => Seq[String]): Int = {
    val v = claimVersion(table)
    val dataDir = Paths.get(table, "data", s"c$v")
    try {
      val newEntries = write(dataDir)
      awaitPredecessor(table, v, predecessorTimeoutMs)
      val recorded =
        if (overwrite || v == 1) asNullable(schema)
        else evolvedSchema(versionSchema(table, v - 1), schema)
      // checks survive even a data overwrite (constraints are table
      // properties, not data)
      val headers = Seq(s"#ts=${System.currentTimeMillis()}",
        s"#schema=${recorded.json}") ++
        (if (v > 1) checkHeaders(tableChecks(table, v - 1)) else Nil) ++
        tag.map(t => s"#tag=$t")
      if (overwrite || v == 1)
        landManifest(table, v, headers ++ newEntries)
      else
        landManifest(table, v,
          headers ++ Seq("#delta") ++ newEntries.map("+" + _))
    } catch {
      case t: Throwable => abandonClaim(table, v, dataDir); throw t
    }
    Files.deleteIfExists(versionsDir(table).resolve(s"$v.claim"))
    maybeCheckpoint(table, v)
    v
  }

  /** Parquet reader pinned to version `v`'s RECORDED schema (files
    * written before a column was added read it as NULL; inference
    * fallback for pre-format tables). Also skips footer-sampling schema
    * inference on every versioned read. */
  private def readerFor(spark: SparkSession, table: String,
                        v: Int): org.apache.spark.sql.DataFrameReader =
    versionSchema(table, v).map(spark.read.schema)
      .getOrElse(spark.read)

  /** Read the table as of `version` (defaults to latest) under that
    * version's recorded schema — a pinned read sees the columns the
    * table had THEN; the latest read sees every evolved column, NULL
    * where a file predates it. */
  def snapshot(spark: SparkSession, table: String,
               version: Int = Int.MaxValue): DataFrame = {
    val v = math.min(version, latestVersion(table))
    require(v >= 1, s"no commits in $table")
    readerFor(spark, table, v)
      .parquet(resolvedEntries(table, v).map(entryPath): _*)
  }

  /** The latest version whose COMMIT TIMESTAMP (`#ts=` header) is at or
    * before `tsMillis` — Delta's `TIMESTAMP AS OF` resolution. Versions
    * land in number order with monotone wall-clocks under the
    * single-writer/serialized disciplines; a racing multi-writer pair
    * can land within the same millisecond, where the higher version wins
    * (deterministic either way). Fails loudly when `tsMillis` predates
    * the table (or its vacuumed history — retention declares that gone). */
  def versionAt(table: String, tsMillis: Long): Int = {
    val v = latestVersion(table)
    require(v >= 1, s"no commits in $table")
    val at = (1 to v).filter(k =>
        Files.exists(versionsDir(table).resolve(k.toString)) &&
          versionTimestamp(table, k) <= tsMillis)
      .maxOption
    require(at.isDefined,
      s"no version of $table at or before ts=$tsMillis — the timestamp " +
        "predates the table or its vacuum retention window")
    at.get
  }

  /** [[snapshot]] pinned by wall-clock instead of version number —
    * `TIMESTAMP AS OF`: the table exactly as a reader at that moment
    * resolved it. */
  def snapshotAsOf(spark: SparkSession, table: String,
                   tsMillis: Long): DataFrame =
    snapshot(spark, table, versionAt(table, tsMillis))

  /** Read the snapshot PRUNED to the files whose manifest metadata says
    * `partCol` ∈ `values` — the manifest-as-index read: file selection is
    * metadata-only (no directory listing, no partition discovery), so a
    * z-box read or an IVF probe over a versioned layout touches exactly
    * the files of the requested buckets/cells at any table size. Entries
    * WITHOUT metadata for `partCol` (plain commits mixed into the table)
    * are kept conservatively — correctness never depends on the pruning.
    * `values` are the RAW partition values (escaping is decoded at
    * commit time). */
  def snapshotWhere(spark: SparkSession, table: String, partCol: String,
                    values: Set[String],
                    version: Int = Int.MaxValue): DataFrame =
    snapshotWhereRanges(spark, table, partCol, values, Nil, version)

  /** Read the snapshot PRUNED by FILE STATS: keep only files whose
    * recorded `s:col=min..max` range can intersect [lo, hi] — range
    * data-skipping on a NON-partition column from the manifest alone,
    * the other half of the Delta/Iceberg metadata-pruning model next to
    * [[snapshotWhere]]'s partition pruning. Files without a stat for
    * `column` (dir-grain commits, all-null files) are kept
    * conservatively — correctness never depends on the pruning; the
    * caller applies the exact predicate on top. */
  def snapshotRange(spark: SparkSession, table: String, column: String,
                    lo: Long, hi: Long,
                    version: Int = Int.MaxValue): DataFrame = {
    val v = math.min(version, latestVersion(table))
    require(v >= 1, s"no commits in $table")
    val kept = resolvedEntries(table, v).flatMap(expandEntryAll)
      .filter { case (_, metas) => statsIntersect(metas, column, lo, hi) }
      .map(_._1)
    if (kept.isEmpty) snapshot(spark, table, v).where(lit(false))
    else readerFor(spark, table, v).parquet(kept.distinct: _*)
  }

  private def statsIntersect(metas: Seq[(String, String)], column: String,
                             lo: Long, hi: Long): Boolean =
    metas.find(_._1 == s"s:$column") match {
      case Some((_, rng)) =>
        val i = rng.indexOf("..")
        val (mn, mx) = (rng.substring(0, i).toLong,
          rng.substring(i + 2).toLong)
        mx >= lo && mn <= hi
      case None => true // no stat: kept conservatively
    }

  /** Combined metadata pruning in ONE manifest pass: partition-value AND
    * per-file stat ranges (every range must be able to intersect). The
    * encoded z-layout's versioned box read composes both — bucket set
    * via `partCol`, per-dimension CODE ranges via `ranges` — so the file
    * set shrinks on each axis before any data file opens. Conservative
    * on missing metadata, like both single-axis reads. */
  def snapshotWhereRanges(spark: SparkSession, table: String,
                          partCol: String, values: Set[String],
                          ranges: Seq[(String, Long, Long)],
                          version: Int = Int.MaxValue): DataFrame = {
    val v = math.min(version, latestVersion(table))
    require(v >= 1, s"no commits in $table")
    val kept = resolvedEntries(table, v).flatMap(expandEntryAll)
      .filter { case (_, metas) =>
        val partOk = metas.find(m => !m._1.startsWith("s:")) match {
          case Some((c, pv)) if c == partCol => values.contains(pv)
          case _ => true // no partition metadata: kept conservatively
        }
        partOk && ranges.forall { case (c, lo, hi) =>
          statsIntersect(metas, c, lo, hi)
        }
      }
      .map(_._1)
    if (kept.isEmpty) snapshot(spark, table, v).where(lit(false))
    else readerFor(spark, table, v).parquet(kept.distinct: _*)
  }

  /** Claim the next version for a MAINTENANCE commit (delete/compaction):
    * unlike an append, a maintenance commit REWRITES part of the base
    * snapshot's file list, so its base must still be the immediate
    * predecessor at claim time — a commit that landed in between means
    * the rewritten list is stale, and the operation aborts with a
    * conflict error (the caller re-reads and retries) instead of
    * landing a manifest that silently drops the interleaved commit. */
  private def claimMaintenance(table: String, base: Int): Int = {
    val v = claimVersion(table)
    if (v != base + 1) {
      Files.deleteIfExists(versionsDir(table).resolve(s"$v.claim"))
      throw new java.util.ConcurrentModificationException(
        s"maintenance on $table based on version $base lost the race " +
          s"(next free version is $v) — re-read the snapshot and retry")
    }
    v
  }

  /** Land a MAINTENANCE delta: `-` lines for every touched base entry
    * (at its STORED grain), `+` lines for the survivors of touched
    * dir-grain entries and the operation's new files. Untouched entries
    * are never rewritten — manifest bytes written scale with files
    * TOUCHED, not table size. The base version's schema carries forward
    * verbatim (maintenance never changes the logical table). */
  private def landMaintenanceDelta(table: String, v: Int,
      removedPaths: Seq[String], added: Seq[String]): Unit =
    landManifest(table, v,
      Seq(s"#ts=${System.currentTimeMillis()}") ++
        versionSchema(table, v - 1).map(s => s"#schema=${s.json}") ++
        checkHeaders(tableChecks(table, v - 1)) ++
        Seq("#delta") ++
        removedPaths.map("-" + _) ++ added.map("+" + _))

  /** SNAPSHOT-ISOLATED row-level delete — [[Deletes.deleteWhere]]'s
    * file-targeted shape expressed as a manifest commit: one discovery
    * scan finds the affected files, ONLY their survivors are rewritten
    * into the next commit dir (file-locality preserved: survivors stay
    * grouped by source file, `sortCols` restores within-file order), and
    * the delta manifest retires exactly the touched entries. Nothing
    * live is renamed or removed, so concurrent readers on any pinned
    * version are never exposed to a partial table and a crash anywhere
    * leaves every landed version fully readable. Returns the new version
    * (the current one when nothing matched — no empty commits).
    *
    * NULL discipline as [[Deletes.deleteWhere]]: a NULL-predicate row is
    * kept. */
  /** `emitChanges = true` records the deleted rows as the commit's
    * CHANGE FEED (`delete` rows for [[changes]]) — one extra filtered
    * pass over the affected files, never the table. */
  def deleteWhere(spark: SparkSession, table: String, pred: Column,
                  sortCols: Seq[String] = Nil,
                  emitChanges: Boolean = false): Int = {
    val v = latestVersion(table)
    require(v >= 1, s"no commits in $table")
    val stored = resolvedEntries(table, v)
    val expanded = stored.map(e => (e, expandEntryAll(e)))
    val allFiles = expanded.flatMap(_._2.map(_._1)).distinct
    val df = readerFor(spark, table, v).parquet(allFiles: _*)
    val matchP = coalesce(pred, lit(false))
    val affected = df.where(matchP)
      .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
      .collect().map(r => fileOfUri(r.getString(0))).toSet
    if (affected.isEmpty) return v
    val aff = readerFor(spark, table, v).parquet(affected.toSeq: _*)
    // touched entries: any stored entry resolving to an affected file —
    // removed at stored grain; their UNAFFECTED files are re-added
    // verbatim (file grain, metadata preserved)
    val touched = expanded.filter(_._2.exists(e => affected.contains(e._1)))
    val keptOfTouched = touched.flatMap(_._2)
      .filterNot(e => affected.contains(e._1)).distinctBy(_._1)
      .map((formatEntryAll _).tupled)
    // METADATA PRESERVATION through the rewrite: when every affected file
    // carries partition metadata on one column, the survivors are
    // rewritten partitioned on it; stat columns present on EVERY affected
    // file are recomputed for the rewritten files — a compliance delete
    // on a versioned z-layout/IVF/stats table keeps [[snapshotWhere]] and
    // [[snapshotRange]] pruning intact (untouched files keep their
    // original metadata lines verbatim either way).
    val affectedMetas = touched.flatMap(_._2)
      .filter(e => affected.contains(e._1)).distinctBy(_._1)
    val partMetaCol = affectedMetas
      .map(_._2.collectFirst { case (k, _) if !k.startsWith("s:") => k })
      .distinct match {
      case Seq(Some(c)) => Some(c)
      case _ => None
    }
    val statCols = affectedMetas
      .map(_._2.collect { case (k, _) if k.startsWith("s:") =>
        k.stripPrefix("s:") }.toSet)
      .reduceOption(_ intersect _).getOrElse(Set.empty).toSeq.sorted
    val nv = claimMaintenance(table, v)
    val newDir = Paths.get(table, "data", s"c$nv")
    try {
      if (emitChanges)
        aff.where(matchP)
          .withColumn(ChangeTypeCol, lit("delete"))
          .withColumn(CommitVersionCol, lit(nv))
          .write.parquet(changesDir(table, nv).toString)
      val survivors =
        Deletes.rewriteSurvivors(aff, !matchP, affected.size, Nil, sortCols)
      val newEntries = partMetaCol match {
        case Some(c) =>
          survivors.withColumn(partDirCol, col(c).cast("string"))
            .write.partitionBy(partDirCol).parquet(newDir.toString)
          commitEntries(spark, newDir, Some(c), statCols)
        case None if statCols.nonEmpty =>
          survivors.write.parquet(newDir.toString)
          commitEntries(spark, newDir, None, statCols)
        case None =>
          survivors.write.parquet(newDir.toString)
          // an all-matching delete leaves survivors empty and the commit
          // dir without data files — listing it in the manifest would make
          // the snapshot unreadable; and a manifest with NO entries at all
          // is not representable (snapshot has no schema to return)
          if (expandFiles(newDir.toString).nonEmpty) Seq(newDir.toString)
          else Nil
      }
      val touchedPaths = touched.map(t => entryPath(t._1)).toSet
      val remaining = stored.count(e => !touchedPaths.contains(entryPath(e)))
      require(remaining + keptOfTouched.size + newEntries.size > 0,
        s"deleteWhere would remove EVERY row of $table — a manifest " +
          "cannot represent a schema-less empty table; land an explicit " +
          "empty frame via commit(emptyDf, overwrite = true) instead")
      landMaintenanceDelta(table, nv, touchedPaths.toSeq.sorted,
        keptOfTouched ++ newEntries)
    } catch {
      case t: Throwable =>
        abandonClaim(table, nv, newDir)
        try {
          if (Files.exists(changesDir(table, nv)))
            walkDir(changesDir(table, nv)).reverse
              .foreach(f => Files.deleteIfExists(f): Unit)
        } catch { case _: Exception => () }
        throw t
    }
    Files.deleteIfExists(versionsDir(table).resolve(s"$nv.claim"))
    maybeCheckpoint(table, nv)
    nv
  }

  /** DISCOVERY PRUNING for [[merge]]: with a single key column and
    * `s:<key>` manifest stats, only files whose recorded range
    * intersects the source-key range can hold a match — the discovery
    * scan shrinks to the stats-pruned candidate set (conservative:
    * stat-less files stay; multi-column keys and non-integral keys fall
    * back to every file). On a key-clustered stats-enabled table this
    * makes the WHOLE merge affected-files-sized, discovery included.
    * Package-private so the spec can pin the strict candidate subset. */
  private[io] def mergeDiscoveryCandidates(
      expanded: Seq[(String, Seq[(String, Seq[(String, String)])])],
      keyCols: Seq[String], srcKeys: DataFrame): Seq[String] = {
    val allFiles = expanded.flatMap(_._2.map(_._1)).distinct
    if (keyCols.size != 1) return allFiles
    val kc = keyCols.head
    val hasStats = expanded.exists(_._2.exists(
      _._2.exists(_._1 == s"s:$kc")))
    if (!hasStats) return allFiles
    val r = srcKeys.agg(min(col(kc).cast("long")),
      max(col(kc).cast("long"))).head()
    if (r.isNullAt(0)) allFiles // non-integral key: no pruning
    else expanded.flatMap(_._2)
      .filter { case (_, metas) =>
        statsIntersect(metas, kc, r.getLong(0), r.getLong(1)) }
      .map(_._1).distinct
  }

  /** The candidate file set a `merge(table, source, keyCols)` would scan
    * for discovery at the CURRENT version — the spec's pinning surface
    * for [[mergeDiscoveryCandidates]]. */
  private[io] def mergeCandidatesForSpec(spark: SparkSession,
      table: String, keyCols: Seq[String],
      source: DataFrame): Seq[String] = {
    val v = latestVersion(table)
    mergeDiscoveryCandidates(
      resolvedEntries(table, v).map(e => (e, expandEntryAll(e))),
      keyCols, source.select(keyCols.map(col): _*))
  }

  // --- CHANGE DATA FEED (Delta CDF): row-level changes per commit ---

  /** Where commit `v`'s recorded change rows live (parquet; written by
    * [[merge]]/[[deleteWhere]] with `emitChanges = true`). Underscore
    * dir — never manifest-referenced, invisible to snapshot readers. */
  private def changesDir(table: String, v: Int): Path =
    Paths.get(table, "_changes", s"c$v")

  /** Change-feed column names ([[changes]] output): the change class
    * (`insert` / `update_preimage` / `update_postimage` / `delete`) and
    * the commit version that produced the row. */
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  /** Row-level CHANGES between versions (exclusive `fromV`, inclusive
    * `toV`) — the Delta Change Data Feed read: each commit contributes
    * its typed change rows, aligned to `toV`'s schema (pre-evolution
    * rows null-fill later columns).
    *
    *  - APPEND commits (including partitioned/clustered appends and the
    *    streaming epoch commits) need nothing recorded: their own new
    *    files ARE the insert set, read directly.
    *  - MERGE / DELETE commits contribute their recorded feed
    *    (`emitChanges = true` at the operation). A rewriting commit
    *    WITHOUT a recorded feed fails this read loudly — its physical
    *    adds/removes (rewritten survivors) do not represent logical row
    *    changes, and silently returning them would corrupt any
    *    downstream incremental consumer.
    *  - OVERWRITE commits are not representable (the pre-image is the
    *    whole prior table) and fail loudly.
    *
    * Physical feed files below the vacuum retention boundary are swept
    * with their versions; reading a vacuumed range fails on the missing
    * manifest, same as time travel. */
  def changes(spark: SparkSession, table: String, fromV: Int,
              toV: Int = Int.MaxValue): DataFrame = {
    val hi = math.min(toV, latestVersion(table))
    require(fromV >= 0 && hi > fromV,
      s"empty change range ($fromV, $toV] on $table")
    val schema = versionSchema(table, hi)
    val aligned = (d: DataFrame) => schema match {
      case None => d
      case Some(sc) =>
        val keep = sc.fieldNames.toSeq ++
          Seq(ChangeTypeCol, CommitVersionCol).filter(d.columns.contains)
        d.select(keep.map(n =>
          if (d.columns.contains(n)) col(n)
          else lit(null).cast(sc(n).dataType).as(n)): _*)
    }
    val parts = ((fromV + 1) to hi).flatMap { v =>
      val recorded = changesDir(table, v)
      if (Files.exists(recorded))
        Some(aligned(spark.read.parquet(recorded.toString)))
      else {
        val ls = manifestLines(table, v)
        val body = ls.filterNot(l => l.startsWith("#") || l.isEmpty)
        val isDelta = ls.contains("#delta")
        require(v == 1 || isDelta,
          s"version $v of $table is an OVERWRITE commit — its pre-image " +
            "is the whole prior table; the change feed cannot represent " +
            "it. Re-seed consumers from a snapshot instead")
        require(!isDelta || !body.exists(_.startsWith("-")),
          s"version $v of $table rewrites files but recorded no change " +
            "feed (merge/delete ran with emitChanges = false) — its " +
            "physical adds are NOT logical inserts; rerun the operation " +
            "with emitChanges = true or re-seed consumers from a snapshot")
        val added =
          if (isDelta) body.collect { case l if l.startsWith("+") =>
            l.substring(1) }
          else body
        val files = added.flatMap(expandFiles)
        if (files.isEmpty) None // metadata-only commit (e.g. addCheck)
        else {
          val rd = versionSchema(table, v).map(spark.read.schema)
            .getOrElse(spark.read)
          Some(aligned(rd.parquet(files: _*)
            .withColumn(ChangeTypeCol, lit("insert"))
            .withColumn(CommitVersionCol, lit(v))))
        }
      }
    }
    if (parts.nonEmpty) parts.reduce(_ unionByName _)
    else { // only metadata commits in range: empty frame, right shape
      import org.apache.spark.sql.types._
      val base = schema.getOrElse(new StructType())
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        base.add(ChangeTypeCol, StringType).add(CommitVersionCol, IntegerType))
    }
  }

  /** SNAPSHOT-ISOLATED MERGE (upsert) — Delta's `MERGE INTO` with
    * update-all-columns / insert-unmatched semantics, expressed as a
    * file-targeted maintenance commit: one discovery join finds the
    * files holding matched keys, ONLY those files are rewritten (their
    * unmatched survivors + every source row land in the next commit
    * dir), and the delta manifest retires exactly the touched entries —
    * merge cost scales with AFFECTED files + source size, never table
    * size, which is what makes a daily upsert viable at 10⁶ files.
    * Unmatched-key sources degrade to a pure append (no files touched).
    * Pinned readers never see a partial merge; a crash leaves every
    * landed version readable.
    *
    * `emitChanges = true` additionally records the commit's CHANGE FEED
    * (matched targets as `update_preimage`, matched source rows as
    * `update_postimage`, unmatched source rows as `insert`) for
    * [[changes]] — one extra pass over the affected files + source,
    * never the table.
    *
    * Contract guards (all loud):
    *  - `keyCols` must exist in both sides with compatible types;
    *  - source keys must be UNIQUE (two source rows matching one target
    *    row make the result order-dependent — Delta errors identically);
    *  - NULL source keys are rejected (they can never match and would
    *    silently insert unkeyable rows);
    *  - source schema may ADD columns (evolution — older files read
    *    NULL) but never drop or retype, the [[commit]] append contract.
    *
    * `sortCols` restores within-file order in the rewrite. `tag` lands
    * in the manifest header (the streaming upsert sink's exactly-once
    * epoch id). Returns the new version. */
  def merge(spark: SparkSession, table: String, source: DataFrame,
            keyCols: Seq[String], sortCols: Seq[String] = Nil,
            tag: Option[String] = None,
            emitChanges: Boolean = false): Int = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val v = latestVersion(table)
    require(v >= 1, s"no commits in $table")
    val tableSchema = versionSchema(table, v)
    keyCols.foreach { k =>
      require(source.columns.contains(k), s"source lacks key column $k")
      tableSchema.foreach(ts => require(ts.fieldNames.contains(k),
        s"table lacks key column $k"))
    }
    // schema evolution/enforcement identical to an append
    val recorded = evolvedSchema(tableSchema, source.schema)
    val srcKeys = source.select(keyCols.map(col): _*)
    val srcStats = srcKeys
      .agg(count(lit(1)).as("n"), count_distinct(struct(
        keyCols.map(col): _*)).as("d"),
        sum(keyCols.map(c => when(col(c).isNull, 1).otherwise(0))
          .reduce(_ + _)).as("nulls")).head()
    if (srcStats.getLong(0) == 0L) return v // empty source: no-op
    require(srcStats.getLong(2) == 0L,
      s"merge source carries NULL keys — they can never match a target " +
        "row and would insert unkeyable rows")
    require(srcStats.getLong(0) == srcStats.getLong(1),
      s"merge source keys are not unique (${srcStats.getLong(0)} rows, " +
        s"${srcStats.getLong(1)} distinct keys) — two source rows " +
        "matching one target row make the result order-dependent")
    val stored = resolvedEntries(table, v)
    val expanded = stored.map(e => (e, expandEntryAll(e)))
    val candidates = mergeDiscoveryCandidates(expanded, keyCols, srcKeys)
    val target = readerFor(spark, table, v).parquet(candidates: _*)
    // discovery: the files holding at least one matched key (one join;
    // AQE broadcasts a small source side on its own). input_file_name()
    // is captured IN THE SCAN STAGE — after a shuffle join it would
    // evaluate to "" and silently mark nothing affected
    val affected = target.withColumn("__vf", input_file_name())
      .join(srcKeys, keyCols, "left_semi")
      .groupBy(col("__vf")).agg(count(lit(1)).as("n"))
      .collect().map(r => fileOfUri(r.getString(0))).toSet
    val touched = expanded.filter(_._2.exists(e => affected.contains(e._1)))
    val keptOfTouched = touched.flatMap(_._2)
      .filterNot(e => affected.contains(e._1)).distinctBy(_._1)
      .map((formatEntryAll _).tupled)
    // metadata preservation through the rewrite, as in [[deleteWhere]]
    val affectedMetas = touched.flatMap(_._2)
      .filter(e => affected.contains(e._1)).distinctBy(_._1)
    val partMetaCol = affectedMetas
      .map(_._2.collectFirst { case (k, _) if !k.startsWith("s:") => k })
      .distinct match {
      case Seq(Some(c)) => Some(c)
      case _ => None
    }
    val statCols = affectedMetas
      .map(_._2.collect { case (k, _) if k.startsWith("s:") =>
        k.stripPrefix("s:") }.toSet)
      .reduceOption(_ intersect _).getOrElse(Set.empty).toSeq.sorted
    val nv = claimMaintenance(table, v)
    val newDir = Paths.get(table, "data", s"c$nv")
    try {
      // survivors of affected files (unmatched rows) + EVERY source row
      // (matched = the update, unmatched = the insert), aligned to the
      // evolved schema so pre-evolution survivors carry NULL new columns
      val aligned = (d: DataFrame) => d.select(recorded.fieldNames.map(n =>
        if (d.columns.contains(n)) col(n)
        else lit(null).cast(recorded(n).dataType).as(n)): _*)
      val survivors =
        if (affected.isEmpty) aligned(source)
        else aligned(readerFor(spark, table, v)
            .parquet(affected.toSeq: _*)
            .join(srcKeys, keyCols, "left_anti"))
          .unionByName(aligned(source))
      if (emitChanges) {
        val tgtAff =
          if (affected.isEmpty) None
          else Some(readerFor(spark, table, v).parquet(affected.toSeq: _*))
        val pre = tgtAff.map(t =>
          aligned(t.join(srcKeys, keyCols, "left_semi"))
            .withColumn(ChangeTypeCol, lit("update_preimage")))
        val post = tgtAff.map(t =>
          aligned(source.join(t.select(keyCols.map(col): _*),
              keyCols, "left_semi"))
            .withColumn(ChangeTypeCol, lit("update_postimage")))
        val ins = aligned(tgtAff match {
          case Some(t) => source.join(t.select(keyCols.map(col): _*),
            keyCols, "left_anti")
          case None => source
        }).withColumn(ChangeTypeCol, lit("insert"))
        (pre.toSeq ++ post.toSeq :+ ins).reduce(_ unionByName _)
          .withColumn(CommitVersionCol, lit(nv))
          .write.parquet(changesDir(table, nv).toString)
      }
      // constraints validate the whole written frame (survivors re-pass
      // trivially; source rows are the real subjects) — fused, no pass
      val checked = checkGuard(survivors, table)
      val sorted =
        if (sortCols.isEmpty) checked
        else checked.sortWithinPartitions(sortCols.map(col): _*)
      val newEntries = partMetaCol match {
        case Some(c) =>
          sorted.withColumn(partDirCol, col(c).cast("string"))
            .write.partitionBy(partDirCol).parquet(newDir.toString)
          commitEntries(spark, newDir, Some(c), statCols)
        case None if statCols.nonEmpty =>
          sorted.write.parquet(newDir.toString)
          commitEntries(spark, newDir, None, statCols)
        case None =>
          sorted.write.parquet(newDir.toString)
          Seq(newDir.toString)
      }
      landManifest(table, nv,
        Seq(s"#ts=${System.currentTimeMillis()}",
          s"#schema=${recorded.json}") ++
          checkHeaders(tableChecks(table, v)) ++
          tag.map(t => s"#tag=$t") ++ Seq("#delta") ++
          touched.map(t => entryPath(t._1)).distinct.sorted.map("-" + _) ++
          (keptOfTouched ++ newEntries).map("+" + _))
    } catch {
      case t: Throwable =>
        abandonClaim(table, nv, newDir)
        try {
          if (Files.exists(changesDir(table, nv)))
            walkDir(changesDir(table, nv)).reverse
              .foreach(f => Files.deleteIfExists(f): Unit)
        } catch { case _: Exception => () }
        throw t
    }
    Files.deleteIfExists(versionsDir(table).resolve(s"$nv.claim"))
    maybeCheckpoint(table, nv)
    nv
  }

  /** SNAPSHOT-ISOLATED full-table REWRITE — the `OPTIMIZE ZORDER BY`
    * shape: the whole current snapshot passes through `transform` (a
    * re-layout — row CONTENT must be preserved, only physical
    * organization changes) and lands as ONE conflict-checked maintenance
    * commit that retires every current entry and adds the rewritten
    * files (partitioned on `partCol` with per-file metadata, plus
    * `statsCols` footer stats). Pinned readers keep their version;
    * a commit landing between the snapshot read and the claim aborts
    * the rewrite with the standard conflict error (the caller re-reads
    * and retries) — never a lost update. Unlike the incremental
    * [[compactSmallFiles]], this rewrites EVERYTHING: it is the
    * re-clustering maintenance pass (run rarely, budgeted table-sized),
    * not the per-epoch small-file sweep. */
  def rewriteAll(spark: SparkSession, table: String,
                 transform: DataFrame => DataFrame,
                 partCol: Option[String] = None,
                 statsCols: Seq[String] = Nil): Int = {
    val v = latestVersion(table)
    require(v >= 1, s"no commits in $table")
    val stored = resolvedEntries(table, v)
    val df = transform(snapshot(spark, table, v))
    val nv = claimMaintenance(table, v)
    val newDir = Paths.get(table, "data", s"c$nv")
    try {
      val newEntries = partCol match {
        case Some(c) =>
          df.withColumn(partDirCol,
              when(col(c).isNull, raise_error(lit(
                s"NULL $c — a null partition value would vanish from " +
                  "every pruned snapshot read")))
                .otherwise(col(c).cast("string")))
            .write.partitionBy(partDirCol).parquet(newDir.toString)
          commitEntries(spark, newDir, Some(c), statsCols)
        case None =>
          df.write.parquet(newDir.toString)
          commitEntries(spark, newDir, None, statsCols)
      }
      landMaintenanceDelta(table, nv,
        stored.map(entryPath).distinct.sorted, newEntries)
    } catch {
      case t: Throwable => abandonClaim(table, nv, newDir); throw t
    }
    Files.deleteIfExists(versionsDir(table).resolve(s"$nv.claim"))
    maybeCheckpoint(table, nv)
    nv
  }

  /** SNAPSHOT-ISOLATED small-file compaction — the OPTIMIZE commit:
    * files under `smallBytes` are coalesced into ~`smallBytes` outputs in
    * the next commit dir; the delta manifest keeps every large file
    * untouched and swaps the small ones for the new files. Same
    * isolation story as [[deleteWhere]]: pinned readers never see the
    * transition; retired small files stay on disk for older versions
    * until [[vacuum]]. Returns the new version (current when <2 small
    * files — nothing to gain).
    *
    * `sortCols`: within-file order restored in the PARTITIONED rewrite
    * path (a z-layout's zv clustering must survive its own OPTIMIZE);
    * the plain coalesce path preserves row order by construction. */
  def compactSmallFiles(spark: SparkSession, table: String,
                        smallBytes: Long,
                        sortCols: Seq[String] = Nil): Int = {
    require(smallBytes > 0, "smallBytes must be positive")
    val v = latestVersion(table)
    require(v >= 1, s"no commits in $table")
    val stored = resolvedEntries(table, v)
    val expanded = stored.map(e => (e, expandEntryAll(e).map { case (f, m) =>
      (f, m, Files.size(Paths.get(f))) }))
    val small = expanded.flatMap(_._2).distinctBy(_._1)
      .filter(_._3 < smallBytes)
    if (small.size < 2) return v
    val smallSet = small.map(_._1).toSet
    val nOut = math.max(1,
      math.ceil(small.map(_._3).sum.toDouble / smallBytes).toInt)
    // as in [[deleteWhere]]: uniform single-column partition metadata on
    // the small files → the compacted replacement is rewritten per
    // partition value; stat columns present on EVERY small file are
    // recomputed for the replacements — manifest pruning survives the
    // OPTIMIZE on both axes. Mixed/absent metadata falls back to the
    // order-preserving coalesce (no shuffle).
    val partMetaCol = small
      .map(_._2.collectFirst { case (k, _) if !k.startsWith("s:") => k })
      .distinct match {
      case Seq(Some(c)) => Some(c)
      case _ => None
    }
    val statCols = small
      .map(_._2.collect { case (k, _) if k.startsWith("s:") =>
        k.stripPrefix("s:") }.toSet)
      .reduceOption(_ intersect _).getOrElse(Set.empty).toSeq.sorted
    val nv = claimMaintenance(table, v)
    val newDir = Paths.get(table, "data", s"c$nv")
    try {
      val sm = readerFor(spark, table, v).parquet(small.map(_._1): _*)
      val newEntries = partMetaCol match {
        case Some(c) =>
          // RANGE-partition the rewrite on (partition value, sortCols) —
          // a hash repartition on the value alone funnels a HOT partition
          // value into ONE task and one arbitrarily large unsplittable
          // output file (the ADVICE-r14 skew finding); ranging on the
          // sort key splits a hot value across ~nOut bounded files while
          // cold values stay contiguous (≈1 file each). With no sortCols
          // to range on, a deterministic row hash salts the boundary.
          val rangeCols =
            if (sortCols.nonEmpty) (c +: sortCols).map(col)
            else Seq(col(c),
              pmod(xxhash64(sm.columns.map(col): _*), lit(1 << 16)))
          sm.repartitionByRange(math.max(nOut, 1), rangeCols: _*)
            .sortWithinPartitions((c +: sortCols).map(col): _*)
            .withColumn(partDirCol, col(c).cast("string"))
            .write.partitionBy(partDirCol).parquet(newDir.toString)
          commitEntries(spark, newDir, Some(c), statCols)
        case None if statCols.nonEmpty =>
          sm.coalesce(nOut).write.parquet(newDir.toString)
          commitEntries(spark, newDir, None, statCols)
        case None =>
          sm.coalesce(nOut).write.parquet(newDir.toString)
          Seq(newDir.toString)
      }
      // touched entries: any stored entry resolving to a small file;
      // their big files are re-added verbatim at file grain
      val touched = expanded.filter(_._2.exists(e => smallSet.contains(e._1)))
      val keptOfTouched = touched.flatMap(_._2)
        .filterNot(e => smallSet.contains(e._1)).distinctBy(_._1)
        .map(e => formatEntryAll(e._1, e._2))
      landMaintenanceDelta(table, nv,
        touched.map(t => entryPath(t._1)).distinct.sorted,
        keptOfTouched ++ newEntries)
    } catch {
      case t: Throwable => abandonClaim(table, nv, newDir); throw t
    }
    Files.deleteIfExists(versionsDir(table).resolve(s"$nv.claim"))
    maybeCheckpoint(table, nv)
    nv
  }

  /** Physically remove data files referenced by NO retained version and
    * drop manifests older than the retention window. This is the ONLY
    * destructive operation in the module — everything else strictly adds
    * files; time travel below the retention boundary stops working, by
    * declaration, exactly like Delta's VACUUM. Returns the removed file
    * paths.
    *
    * Retention is the UNION of two windows: the last `retainLast`
    * versions by count, plus (when `olderThanMs >= 0`) every version
    * whose COMMIT TIMESTAMP (`#ts=` manifest header; file mtime for
    * pre-format manifests) is within the last `olderThanMs` milliseconds
    * — the "retain 7 days" policy real operators set (versions land in
    * number order, so the time-retained set is always a suffix and the
    * kept range stays contiguous). `olderThanMs < 0` disables the time
    * window (count-only, the original behavior). Before dropping old
    * manifests, a CHECKPOINT is written at the new retention head so
    * every retained version keeps resolving without the dropped tail.
    *
    * `dryRun = true` REPORTS the files the sweep would remove and
    * performs NO destructive action of any kind — no file deletes, no
    * manifest drops, no claim/staging cleanup. The dry-run plan passes
    * the SAME late-claim re-check the real sweep enforces, so plan and
    * execution see the same guard (a racing writer aborts both). */
  def vacuum(table: String, retainLast: Int = 1,
             olderThanMs: Long = -1L, dryRun: Boolean = false): Seq[String] = {
    require(retainLast >= 1, "must retain at least the latest version")
    val v = latestVersion(table)
    require(v >= 1, s"no commits in $table")
    // an IN-FLIGHT commit (claim above the latest landed version) has a
    // data dir no manifest references YET — the unreferenced-file sweep
    // below would destroy the data its manifest is about to reference.
    // Refuse loudly; run vacuum after it lands (or clear claims whose
    // writers are confirmed dead). Check-then-act caveat narrowed to
    // closed: the deletion list is fixed by the walk BELOW, a claim filed
    // before the walk is caught by the re-check AFTER it, and a claim
    // filed after the re-check writes its files after the list was fixed
    // — so the sweep itself cannot eat an in-flight commit's data files.
    // The empty-dir prune at the end re-reads claims separately (its
    // hazard window is its own).
    def inflightClaims(): Seq[Int] = claimNumbers(table).filter(_ > v)
    val inflight = inflightClaims()
    require(inflight.isEmpty,
      s"vacuum refused: in-flight commit claim(s) ${inflight.mkString(", ")} " +
        s"on $table — their data dirs are not yet manifest-referenced and " +
        "would be destroyed; vacuum after they land, or clear the claims " +
        "of writers confirmed dead")
    val countHead = math.max(1, v - retainLast + 1)
    val keepHead =
      if (olderThanMs < 0) countHead
      else {
        val cutoff = System.currentTimeMillis() - olderThanMs
        val timeHead = (1 to v).find { k =>
          Files.exists(versionsDir(table).resolve(k.toString)) &&
            versionTimestamp(table, k) >= cutoff
        }.getOrElse(v)
        math.min(countHead, timeHead)
      }
    // referenced = resolved list at the retention head ∪ every entry
    // ADDED after it — one incremental pass, not one full resolution per
    // retained version (removed-then-re-kept files stay safe: a file in
    // any retained version is either in the head's list or added after)
    val referenced = (resolvedEntries(table, keepHead) ++
      ((keepHead + 1) to v).flatMap { k =>
        val ls = manifestLines(table, k)
        val body = ls.filterNot(l => l.startsWith("#") || l.isEmpty)
        if (ls.contains("#delta"))
          body.collect { case l if l.startsWith("+") => l.substring(1) }
        else body
      }).flatMap(expandFiles).toSet
    val dataRoot = Paths.get(table, "data")
    val removed = Seq.newBuilder[String]
    if (Files.exists(dataRoot)) {
      val all = walkDir(dataRoot)
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .map(_.toAbsolutePath)
      val toDelete = all.filterNot(f => referenced.contains(f.toString))
      // second look after enumerating the deletion list: a commit that
      // claimed while we walked would lose its files to the sweep. The
      // dry-run plan takes the SAME guard, so the reported plan is one
      // the real sweep could actually execute.
      val late = inflightClaims()
      require(late.isEmpty,
        s"vacuum aborted before deleting anything: commit claim(s) " +
          s"${late.mkString(", ")} appeared during the file walk")
      if (dryRun) return toDelete.map(_.toString)
      toDelete.foreach { f =>
        if (Files.deleteIfExists(f)) removed += f.toString
      }
      // prune commit dirs emptied of parquet files (crash-orphaned dirs
      // from an unlanded commit clear here too). A dir belonging to a
      // commit claimed AFTER the checks above may exist here with its
      // parquet not yet written — pruning it would break that writer's
      // in-flight job mid-write — so claims are RE-READ at this instant
      // and any dir whose number is claimed or above the landed boundary
      // is left alone (its own commit/abandon path owns it).
      val protected_ = claimNumbers(table).toSet
      listDir(dataRoot).foreach { d: Path =>
        val name = d.getFileName.toString
        val num = if (name.startsWith("c") && name.drop(1).forall(_.isDigit))
          Some(name.drop(1).toInt) else None
        val owned = num.exists(k => k <= v && !protected_.contains(k))
        if (owned && Files.isDirectory(d) && !walkDir(d)
          .exists(f => Files.isRegularFile(f) &&
            f.getFileName.toString.endsWith(".parquet"))) {
          walkDir(d).reverse.foreach(Files.deleteIfExists(_): Unit)
        }
      }
    } else if (dryRun) return Nil
    // the retention head must stay resolvable after its delta ancestry is
    // dropped: materialize its checkpoint BEFORE removing any manifest
    if (keepHead > 1 && !Files.exists(checkpointPath(table, keepHead)))
      writeCheckpoint(table, keepHead)
    (1 until keepHead).foreach { k =>
      Files.deleteIfExists(versionsDir(table).resolve(k.toString)): Unit
      Files.deleteIfExists(checkpointPath(table, k)): Unit
      // the version's change-feed files go with it (changes() below the
      // retention boundary already fails on the missing manifest)
      if (Files.exists(changesDir(table, k)))
        walkDir(changesDir(table, k)).reverse
          .foreach(f => Files.deleteIfExists(f): Unit)
    }
    // orphaned claims of writers that died before landing: any claim at
    // or below the latest LANDED version can never land (the number is
    // burned), and its data dir was cleared by the walk above; staging
    // leftovers from crashed manifest lands clear the same way
    claimNumbers(table).filter(_ <= v).foreach { k =>
      Files.deleteIfExists(versionsDir(table).resolve(s"$k.claim")): Unit
    }
    listDir(versionsDir(table))
      .filter(_.getFileName.toString.contains(".staging"))
      .foreach(Files.deleteIfExists(_): Unit)
    removed.result()
  }
}
