package graft.runtime

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal log-structured transactional table format over a Parquet
  * directory — the Spark-native answer to the reference's reliance on a
  * transactional warehouse (Databricks `MERGE INTO` / `ALTER TABLE` in
  * `macros/rehashing/single_entities/databricks/rehash_single_hub.sql:84-111`)
  * without requiring Delta/Iceberg jars.
  *
  * Layout:
  * {{{
  *   <base>/<name>/_log/v00000001.manifest   # one line per live data file
  *   <base>/<name>/d-<uuid>/part-*.parquet   # immutable data-file batches
  * }}}
  *
  * Properties, each asserted by `TxLogTableSpec`:
  *  - **Atomic commits**: a manifest is staged as `.tmp-*` and published via
  *    a hard-link CAS (`Files.createLink` fails if the version already
  *    exists). A crash mid-commit leaves only ignorable tmp files — never a
  *    half-visible table state.
  *  - **Snapshot isolation**: readers resolve a manifest once; data files
  *    are immutable and never deleted by commits, so a DataFrame read before
  *    a concurrent overwrite/merge keeps returning its version's rows.
  *  - **Optimistic concurrency**: two writers racing to commit the same
  *    version — one wins, the loser sees the CAS fail, re-reads the new
  *    state and retries (append) or aborts (overwrite of a stale snapshot).
  *  - **Time travel**: any retained version can be read back by number.
  *  - **Vacuum**: unreferenced files are deleted only when older than the
  *    retained version horizon, so in-flight readers stay valid.
  *
  * File-level MERGE (`replaceFiles`) is the primitive Delta's MERGE compiles
  * to: rewrite the touched files, commit (removed, added) in one version.
  */
final class TxLogTable(val spark: SparkSession, val baseDir: String) {

  def root(name: String): Path = Paths.get(baseDir, name)
  private def logDir(name: String): Path = root(name).resolve("_log")

  private val ManifestRe = raw"v(\d{8})\.manifest".r

  /** committed versions, ascending (tmp/garbage ignored) */
  def versions(name: String): Seq[Long] = {
    val d = logDir(name)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala.flatMap(_.getFileName.toString match {
        case ManifestRe(n) => Some(n.toLong)
        case _             => None
      }).toSeq.sorted
      finally s.close()
    }
  }

  def currentVersion(name: String): Option[Long] = versions(name).lastOption

  def exists(name: String): Boolean = currentVersion(name).isDefined

  private def manifestPath(name: String, v: Long): Path =
    logDir(name).resolve(f"v$v%08d.manifest")

  /** live data files of a version, relative to the table root */
  def files(name: String, v: Long): Seq[String] =
    Files.readAllLines(manifestPath(name, v)).asScala.toSeq.filter(_.nonEmpty)

  /** Publish `lines` as version `v` of `name`. Returns false when `v` was
    * committed concurrently by another writer (CAS lost — re-read, retry). */
  private def tryCommit(name: String, v: Long, lines: Seq[String]): Boolean = {
    Files.createDirectories(logDir(name))
    val tmp = logDir(name).resolve(s".tmp-${UUID.randomUUID()}")
    Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    val target = manifestPath(name, v)
    try { Files.createLink(target, tmp); Files.delete(tmp); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.delete(tmp); false
      case e: UnsupportedOperationException =>
        // filesystem without hard links: fall back to create-new move (still
        // atomic-rename on POSIX; the exists-check narrows the race window)
        if (Files.exists(target)) { Files.delete(tmp); false }
        else {
          try { Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE); true }
          catch { case _: java.nio.file.FileAlreadyExistsException =>
            Files.delete(tmp); false }
        }
    }
  }

  /** Write `df` as a new immutable data-file batch; returns relative paths. */
  private def writeBatch(name: String, df: DataFrame): Seq[String] = {
    val batch = s"d-${UUID.randomUUID()}"
    val dir = root(name).resolve(batch)
    df.write.mode("overwrite").parquet(dir.toString)
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).map(f => s"$batch/$f").toSeq
    finally s.close()
  }

  /** read the current snapshot (resolves the manifest ONCE — concurrent
    * commits do not move this DataFrame's version) */
  def read(name: String): DataFrame = readVersion(name,
    currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist")))

  /** time travel */
  def readVersion(name: String, v: Long): DataFrame = {
    val fs = files(name, v)
    if (fs.isEmpty) { // empty table: schema is unrecoverable without files
      throw new IllegalStateException(s"TxLogTable $name@$v holds no files")
    } else spark.read.parquet(fs.map(f => root(name).resolve(f).toString): _*)
  }

  /** S6 — incremental insert: appends never conflict semantically, so a
    * lost CAS re-reads the head and retries against it. */
  def append(name: String, df: DataFrame): Unit = {
    val added = writeBatch(name, df)
    var done = false
    while (!done) {
      val head = currentVersion(name)
      val base = head.map(files(name, _)).getOrElse(Seq.empty)
      done = tryCommit(name, head.getOrElse(0L) + 1, base ++ added)
    }
  }

  /** S5 — table materialization / full refresh. `expectedVersion` (CAS
    * guard) makes read-modify-overwrite safe: pass the version the new
    * contents were derived from; a concurrent commit aborts loudly instead
    * of silently clobbering it. */
  def overwrite(name: String, df: DataFrame,
                expectedVersion: Option[Long] = None): Unit = {
    val added = writeBatch(name, df)
    val head = currentVersion(name)
    expectedVersion.foreach { ev =>
      require(head.contains(ev) || (ev == 0L && head.isEmpty),
        s"TxLogTable $name: expected version $ev but head is $head — " +
          "concurrent commit detected, re-derive and retry")
    }
    if (!tryCommit(name, head.getOrElse(0L) + 1, added))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on overwrite — re-derive and retry")
  }

  /** S7 — file-level MERGE, the primitive a row-level MERGE compiles to:
    * `rewrite` maps the rows of the files it touches; files not in
    * `touched` survive untouched. One version swaps (removed, added)
    * atomically; a concurrent commit aborts loudly (rewrites must re-derive
    * from the new head, same contract as Delta's conflict detection). */
  def replaceFiles(name: String, touched: Seq[String])
                  (rewrite: DataFrame => DataFrame): Unit = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val live = files(name, v)
    require(touched.forall(live.contains),
      s"TxLogTable $name: replaceFiles over non-live files " +
        s"${touched.filterNot(live.contains)}")
    val added = if (touched.isEmpty) Seq.empty else {
      val in = spark.read.parquet(
        touched.map(f => root(name).resolve(f).toString): _*)
      writeBatch(name, rewrite(in))
    }
    val next = live.filterNot(touched.contains) ++ added
    if (!tryCommit(name, v + 1, next))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on replaceFiles — " +
          "re-derive from the new head and retry")
  }

  /** S7 — row-level MERGE compiled onto [[replaceFiles]]' primitive: rows of
    * `name` whose `keyCols` match a `source` row are replaced by it,
    * unmatched `source` rows are inserted — the semantics of the reference's
    * `MERGE INTO` rehash (`rehash_single_hub.sql:84-111`). FILE-PRUNED: a
    * key-presence probe (`input_file_name` + semi-join) finds the files that
    * actually hold matched keys; only those are rewritten, every other live
    * file carries over by identity. One atomic version publishes
    * (removed ∪ added); readers of the old version stay consistent. The
    * probe's collected output is file PATHS — metadata-scale, like a
    * partition listing. */
  def merge(name: String, source: DataFrame, keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"TxLogTable $name does not exist"))
    val live = files(name, v)
    val srcKeys = source.select(keyCols.map(col): _*).distinct()
    val touchedAbs = readVersion(name, v)
      .withColumn("__file", input_file_name())
      .join(srcKeys, keyCols, "left_semi")
      .select("__file").distinct().collect().map(_.getString(0))
    val touched = live.filter(f => touchedAbs.exists(_.endsWith("/" + f)))
    val tableCols = readVersion(name, v).columns.toIndexedSeq
    val survivors =
      if (touched.isEmpty) source.select(tableCols.map(col): _*)
      else spark.read.parquet(touched.map(f => root(name).resolve(f).toString): _*)
        .join(srcKeys, keyCols, "left_anti")
        .unionByName(source.select(tableCols.map(col): _*))
    val added = writeBatch(name, survivors)
    if (!tryCommit(name, v + 1, live.filterNot(touched.contains) ++ added))
      throw new IllegalStateException(
        s"TxLogTable $name: lost commit race on merge — " +
          "re-derive from the new head and retry")
  }

  /** Drop versions older than the newest `retainVersions` and delete data
    * files no retained manifest references. Readers of retained versions
    * stay valid — that is the horizon contract. */
  def vacuum(name: String, retainVersions: Int = 2): Unit = {
    val vs = versions(name)
    val (expired, retained) = vs.splitAt(math.max(0, vs.size - math.max(1, retainVersions)))
    val keep = retained.flatMap(files(name, _)).toSet
    expired.foreach { v =>
      files(name, v).filterNot(keep).foreach { f =>
        Files.deleteIfExists(root(name).resolve(f)): Unit
      }
      Files.deleteIfExists(manifestPath(name, v)): Unit
    }
    // remove emptied batch directories (ignore non-empty: still referenced)
    val s = Files.list(root(name))
    try s.iterator().asScala
      .filter(d => Files.isDirectory(d) && d.getFileName.toString.startsWith("d-"))
      .foreach(d => try Files.delete(d) catch { case _: java.io.IOException => () })
    finally s.close()
  }
}
