package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot/time-travel table format — the atomic-commit rung
  * the layout family (zorder, zonemaps, bloom skip, partition prune,
  * compaction, backfill) stops short of, and what a 100 TB curation
  * pipeline uses daily: read-at-version while writers rewrite.
  *
  * Layout (all paths under one table dir, any Hadoop FileSystem):
  *   data/v%08d/<part>=<val>/part-N.parquet   immutable per-commit data dirs
  *   _manifests/v%08d.txt                immutable manifest: value TAB path
  *
  * The invariants that make it a table format rather than a directory
  * convention:
  *   1. Data and manifest files are IMMUTABLE once written (data goes
  *      to a fresh data/vN under mode("error"); the manifest rename
  *      refuses to overwrite) — so any version, once committed, reads
  *      the same bytes forever — until [[vacuum]] retires versions
  *      older than the retention window (referenced files survive).
  *   2. The manifest rename IS the commit point: tmp + atomic rename,
  *      so a version either exists complete or not at all. Version
  *      discovery lists `_manifests` (a handful of small files) — no
  *      mutable pointer file, hence no window where the table looks
  *      empty mid-swap. A reader that resolved version N plans its
  *      scan from that immutable manifest and is untouched by any
  *      number of later commits.
  *   3. Writers are optimistic: two concurrent commits race to rename
  *      the SAME manifest name; rename-without-overwrite makes the
  *      loser fail loudly instead of silently clobbering (HDFS rename
  *      is atomic; object stores need a conditional-PUT equivalent —
  *      exactly the caveat real formats document).
  *
  * SCHEMA CONTRACT: the table's schema is fixed for its lifetime.
  * [[commitReplace]] carries older data dirs by reference, so a replace
  * commit that changed the schema would mix file schemas within one
  * version — the reader unions BY NAME without allowMissingColumns, so
  * that mistake fails loudly at read instead of silently nulling a
  * column. Schema evolution requires a full-snapshot [[commit]] (every
  * entry rewritten under the new schema); a production format records
  * schema-per-manifest to relax this, which this demo deliberately
  * omits.
  *
  * [[commitReplace]] is the scale story: a partition-level rewrite
  * re-lists UNTOUCHED partitions' existing data dirs in the new
  * manifest instead of rewriting them — the rewrite cost is one
  * partition, the history cost is one small manifest, and old versions
  * keep reading the same immutable files. Partition values are strings
  * (URL-encoded by the parquet writer, decoded here); the partition
  * column is re-attached as a literal per manifest entry, so a
  * manifest-planned read never relies on directory listing.
  */
object Snapshots {

  private def fsOf(s: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Long): Path =
    new Path(dir, f"_manifests/v$v%08d.txt")

  private def readSmall(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** the latest committed version = the highest manifest present
    * (the atomic rename below makes "present" == "complete"); 0 = none */
  def currentVersion(s: SparkSession, dir: String): Long = {
    val fs = fsOf(s, dir)
    val md = new Path(dir, "_manifests")
    if (!fs.exists(md)) 0L
    else fs.listStatus(md).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(_.stripPrefix("v").stripSuffix(".txt").toLong)
      .sorted.lastOption.getOrElse(0L)
  }

  private def readManifest(s: SparkSession, dir: String,
      v: Long): Seq[(String, String)] = {
    val fs = fsOf(s, dir)
    val p = manifestPath(dir, v)
    require(fs.exists(p), s"Snapshots: version $v does not exist at $dir")
    readSmall(fs, p).split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      (line.substring(0, i), line.substring(i + 1))
    }
  }

  /** tmp + atomic rename, REFUSING an existing target — the commit
    * point and the optimistic-concurrency guard in one operation
    * (package-visible so the spec can drive the conflict branch
    * directly: at the API level the race window is between a writer's
    * currentVersion read and its rename, which a test can't interleave) */
  private[graft] def writeManifestAtomic(fs: FileSystem, p: Path,
      content: String): Unit = {
    fs.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".tmp_${p.getName}_${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val renamed = try fs.rename(tmp, p) catch { case _: Throwable => false }
    if (!renamed) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"Snapshots: manifest $p already exists — a concurrent writer " +
          "committed this version first; re-read the table and retry " +
          "(optimistic concurrency)")
    }
  }

  /** Read the table at `version` (-1 = latest). The manifest IS the
    * scan plan: each entry's immutable data dir is read directly and
    * the partition column re-attached as a literal — concurrent
    * commits (which only ADD dirs and manifests) cannot perturb a
    * pinned reader. */
  def read(s: SparkSession, dir: String, partCol: String,
      version: Long = -1L): DataFrame = {
    val v = if (version < 0) currentVersion(s, dir) else version
    require(v >= 1, s"Snapshots: no committed version to read at $dir")
    readManifest(s, dir, v)
      .map { case (value, path) =>
        s.read.parquet(path).withColumn(partCol, lit(value)) }
      .reduce(_.unionByName(_))
  }

  /** Full-snapshot commit: write `df` partitioned by `partCol` into a
    * fresh immutable data dir, manifest every written partition,
    * commit via the atomic manifest rename. Returns the new version. */
  def commit(s: SparkSession, dir: String, df: DataFrame,
      partCol: String): Long =
    commitImpl(s, dir, df, partCol, carryUntouched = false)

  /** Partition-level rewrite commit (the backfill shape): partitions
    * present in `df` get fresh data dirs; every OTHER partition of the
    * previous version is carried into the new manifest BY REFERENCE —
    * zero data movement for untouched partitions, and the previous
    * version keeps reading its own files. */
  def commitReplace(s: SparkSession, dir: String, df: DataFrame,
      partCol: String): Long =
    commitImpl(s, dir, df, partCol, carryUntouched = true)

  /** Retention vacuum — the production knob that bounds history: drop
    * every version older than the newest `keepLast`, deleting (a) the
    * dropped versions' manifests and (b) every partition data dir NOT
    * referenced by any KEPT manifest. Carry-by-reference makes (b) the
    * load-bearing clause: a partition dir written at v1 and still
    * listed in the current manifest survives the vacuum of v1 — only
    * genuinely unreachable files go. Deletion order (manifests first,
    * then data) keeps the invariant that an EXISTING manifest's files
    * always exist: a reader can lose the race only by holding a version
    * older than the retention window, and then fails loudly at the
    * manifest check, never with half-read data. Returns the dropped
    * version numbers. */
  def vacuum(s: SparkSession, dir: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "vacuum keeps at least one version")
    val fs = fsOf(s, dir)
    val cur = currentVersion(s, dir)
    if (cur == 0) return Seq.empty
    val oldest = math.max(1L, cur - keepLast + 1)
    // an EARLIER vacuum may already have retired versions below
    // `oldest` — walk only the manifests that exist (a second vacuum
    // with a wider window must be a no-op, not a read of retired
    // history)
    val existing = (1L to cur).filter(v => fs.exists(manifestPath(dir, v)))
    val kept = existing.filter(_ >= oldest)
      .flatMap(v => readManifest(s, dir, v)).map(_._2).toSet
    val dropped = existing.filter(_ < oldest)
    dropped.foreach(v => fs.delete(manifestPath(dir, v), false))
    val dataRoot = new Path(dir, "data")
    if (fs.exists(dataRoot)) {
      fs.listStatus(dataRoot).foreach { vd =>
        if (vd.isDirectory) {
          fs.listStatus(vd.getPath).foreach { pd =>
            if (pd.isDirectory && !kept(pd.getPath.toString))
              fs.delete(pd.getPath, true)
          }
          if (fs.listStatus(vd.getPath).isEmpty) fs.delete(vd.getPath, false)
        }
      }
    }
    dropped
  }

  private def commitImpl(s: SparkSession, dir: String, df: DataFrame,
      partCol: String, carryUntouched: Boolean): Long = {
    val fs = fsOf(s, dir)
    val prev = currentVersion(s, dir)
    val v = prev + 1
    val dataDir = f"$dir/data/v$v%08d"
    // mode("error"): a data dir is written once, ever — immutability is
    // invariant 1, and a version-number race surfaces here or at the
    // manifest rename, never as a silent overwrite
    df.write.mode("error").partitionBy(partCol).parquet(dataDir)
    val written = fs.listStatus(new Path(dataDir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(partCol + "="))
      .map { st =>
        val raw = st.getPath.getName.stripPrefix(partCol + "=")
        (java.net.URLDecoder.decode(raw, "UTF-8"), st.getPath.toString)
      }
    val writtenVals = written.map(_._1).toSet
    val carried =
      if (!carryUntouched || prev == 0) Nil
      else readManifest(s, dir, prev).filterNot(e => writtenVals(e._1))
    val entries = (carried ++ written).sortBy(_._1)
    require(entries.nonEmpty, "Snapshots: refusing to commit an empty table")
    writeManifestAtomic(fs, manifestPath(dir, v),
      entries.map { case (a, b) => s"$a\t$b" }.mkString("\n"))
    v
  }
}
