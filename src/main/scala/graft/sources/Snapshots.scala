package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot/time-travel table format — the atomic-commit rung
  * the layout family (zorder, zonemaps, bloom skip, partition prune,
  * compaction, backfill) stops short of, and what a 100 TB curation
  * pipeline uses daily: read-at-version while writers rewrite.
  *
  * Layout (all paths under one table dir, any Hadoop FileSystem):
  *   data/v%08d_<nonce>/<part>=<val>/part-N.parquet   immutable data dirs,
  *     PER-WRITER UNIQUE (racers for one version write disjoint dirs and
  *     collide only at the manifest rename; a loser's orphan dir is
  *     referenced by no manifest and retired by the next vacuum)
  *   _manifests/v%08d.txt                immutable manifest (format below)
  *   _manifests/_latest_hint             ADVISORY latest-version hint
  *
  * Manifest format: an optional header line `#schema<TAB><json>` recording
  * the data files' schema (partition column excluded), then one
  * `value<TAB>path<TAB>files<TAB>bytes` line per partition — the file
  * stats are recorded when the immutable dir is written and carried
  * verbatim by replace commits (the Delta add-action shape). The header
  * plus stats make three things O(small manifest read): a read plans its
  * scan with ZERO parquet-footer reads, a [[commitReplace]] that would
  * mix file schemas within one version fails loudly AT COMMIT TIME
  * instead of at some later read, and [[optimize]] picks its compaction
  * candidates from metadata alone.
  *
  * The invariants that make it a table format rather than a directory
  * convention:
  *   1. Data and manifest files are IMMUTABLE once written (data goes
  *      to a fresh per-writer data dir under mode("error"); the manifest rename
  *      refuses to overwrite) — so any version, once committed, reads
  *      the same bytes forever — until [[vacuum]] retires versions
  *      older than the retention window (referenced files survive).
  *   2. The manifest rename IS the commit point: tmp + atomic rename,
  *      so a version either exists complete or not at all. Version
  *      discovery lists `_manifests` (a handful of small files) — no
  *      mutable pointer file ON THE CORRECTNESS PATH, hence no window
  *      where the table looks empty mid-swap. A reader that resolved
  *      version N plans its scan from that immutable manifest and is
  *      untouched by any number of later commits.
  *   3. Writers are optimistic: two concurrent commits race to rename
  *      the SAME manifest name; an exists-precheck plus
  *      rename-without-overwrite makes the loser fail loudly instead of
  *      silently clobbering. CAVEAT (portability): HDFS rename is atomic
  *      and refuses an existing target; object stores need a
  *      conditional-PUT equivalent; and LOCAL filesystems are
  *      version-dependent — POSIX rename(2) REPLACES an existing target,
  *      so RawLocalFileSystem's guarantee rests on the Hadoop-side
  *      target-exists check, which the precheck here narrows but cannot
  *      close. Exactly the caveat real formats document.
  *
  * SCHEMA CONTRACT: the table's schema is fixed for its lifetime, and the
  * partition column is a StringType (asserted at commit — partition values
  * travel through directory names and manifest lines as strings, so a
  * non-string partition column would silently come back re-typed).
  * [[commitReplace]] carries older data dirs by reference, so a replace
  * commit that changes the data schema (names or types; column order and
  * nullability are free — parquet resolves by name) is REFUSED at commit
  * against the previous manifest's schema header. Schema evolution
  * requires a full-snapshot [[commit]] (every entry rewritten under the
  * new schema); a production format records schema-per-manifest to relax
  * this, which this demo deliberately omits.
  *
  * [[commitReplace]] is the scale story: a partition-level rewrite
  * re-lists UNTOUCHED partitions' existing data dirs in the new
  * manifest instead of rewriting them — the rewrite cost is one
  * partition, the history cost is one small manifest, and old versions
  * keep reading the same immutable files. [[optimize]] (compaction-as-
  * version) and a MERGE fold both land through the same two commit
  * shapes, so every maintenance operation is an atomic version.
  *
  * METADATA COST BOUNDS (the long-history story — a streaming sink
  * commits one version per micro-batch): [[currentVersion]] is O(1) FS
  * calls via the `_latest_hint` fast path (read hint, verify, probe
  * forward past any commits that raced the hint write) with a one-listing
  * fallback when the hint is missing/torn/retired — the hint is ADVISORY,
  * never load-bearing, like a real format's `_last_checkpoint`.
  * [[vacuum]] does ONE `_manifests` listing plus one small manifest read
  * per KEPT version — never an exists-probe per historical version.
  */
object Snapshots {

  private def fsOf(s: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Long): Path =
    new Path(dir, f"_manifests/v$v%08d.txt")

  private def hintPath(dir: String): Path =
    new Path(dir, "_manifests/_latest_hint")

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

  /** every committed version still present, ascending — ONE dir listing */
  private def listVersions(fs: FileSystem, dir: String): Seq[Long] = {
    val md = new Path(dir, "_manifests")
    if (!fs.exists(md)) Seq.empty
    else fs.listStatus(md).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(_.stripPrefix("v").stripSuffix(".txt").toLong)
      .sorted
  }

  /** The latest committed version (0 = none). Fast path: the advisory
    * `_latest_hint` + a forward probe (hint is written AFTER a successful
    * commit, so hint <= latest always; the probe absorbs hint writes that
    * lost a race) — O(1) FS calls on the steady path regardless of
    * history length. Any hint defect (missing, torn write, pointing at a
    * vacuum-retired version) falls back to one `_manifests` listing; the
    * hint never decides correctness. */
  def currentVersion(s: SparkSession, dir: String): Long = {
    val fs = fsOf(s, dir)
    val hinted =
      try {
        val hp = hintPath(dir)
        if (!fs.exists(hp)) None
        else {
          val v = readSmall(fs, hp).trim.toLong
          if (v >= 1 && fs.exists(manifestPath(dir, v))) {
            var cur = v
            while (fs.exists(manifestPath(dir, cur + 1))) cur += 1
            Some(cur)
          } else None
        }
      } catch { case _: Exception => None }
    hinted.getOrElse(listVersions(fs, dir).lastOption.getOrElse(0L))
  }

  private val SchemaHeader = "#schema\t"

  /** One manifest entry: partition value, immutable data dir, and the
    * dir's file stats RECORDED AT WRITE TIME (data dirs never change, so
    * the stats are exact forever and carried verbatim through replace
    * commits — the Delta add-action shape that lets [[optimize]] pick its
    * candidates from metadata alone, no per-partition listings).
    * files = -1 marks a legacy entry with unrecorded stats. */
  private[graft] case class Entry(value: String, path: String,
      files: Int, bytes: Long) {
    def line: String = s"$value\t$path\t$files\t$bytes"
  }

  /** (recorded data schema if the manifest has a header, entries) */
  private def readManifestFull(s: SparkSession, dir: String,
      v: Long): (Option[StructType], Seq[Entry]) = {
    val fs = fsOf(s, dir)
    val p = manifestPath(dir, v)
    require(fs.exists(p), s"Snapshots: version $v does not exist at $dir")
    val lines = readSmall(fs, p).split("\n").toSeq.filter(_.nonEmpty)
    // the header is the FIRST line only; every later line is an entry no
    // matter what it starts with (a blanket '#'-prefix filter would
    // silently DROP a partition whose value begins with '#' — missing
    // rows on read and, worse, vacuum deleting its still-referenced dir;
    // commit refuses '#'-leading values so line 0 is unambiguous)
    val (headerOpt, entryLines) = lines match {
      case h +: rest if h.startsWith(SchemaHeader) => (Some(h), rest)
      case all => (None, all)
    }
    val schema = headerOpt
      .map(h => DataTypeUtilsShim.fromJson(h.stripPrefix(SchemaHeader)))
    val entries = entryLines.map { line =>
      line.split("\t", -1) match {
        case Array(value, path, files, bytes) =>
          Entry(value, path, files.toInt, bytes.toLong)
        case Array(value, path) => Entry(value, path, -1, -1L) // legacy
        case _ => throw new IllegalStateException(
          s"Snapshots: malformed manifest line in $p: $line")
      }
    }
    (schema, entries)
  }

  private object DataTypeUtilsShim {
    def fromJson(json: String): StructType =
      org.apache.spark.sql.types.DataType.fromJson(json).asInstanceOf[StructType]
  }

  /** nullability widened RECURSIVELY (structs/arrays/maps included):
    * used for both the recorded read schema and the schema-contract
    * comparison, so nullability — top-level or nested — stays entirely
    * outside the contract and a header can never carry a false non-null
    * guarantee over carried files */
  private def widen(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case st: StructType => StructType(st.fields.map(f =>
        f.copy(dataType = widen(f.dataType), nullable = true)))
      case ArrayType(e, _) => ArrayType(widen(e), containsNull = true)
      case MapType(k, v, _) => MapType(widen(k), widen(v), valueContainsNull = true)
      case other => other
    }
  }

  private def widenStruct(st: StructType): StructType =
    widen(st).asInstanceOf[StructType]

  /** tmp + atomic rename, REFUSING an existing target — the commit
    * point and the optimistic-concurrency guard in one operation. The
    * exists-precheck narrows (does not close — see invariant 3's local-
    * filesystem caveat) the window on filesystems whose rename replaces.
    * (Package-visible so the spec can drive the conflict branch
    * directly: at the API level the race window is between a writer's
    * currentVersion read and its rename, which a test can't interleave.) */
  /** the OCC loser's signal — a dedicated type so [[commitRetry]] never
    * mistakes an unrelated failure (any error whose message happens to
    * contain "already exists") for a lost race and masks it behind
    * `attempts` full recomputes. Also raised when a STALLED writer's
    * rename targets a version number at or below the vacuum retention
    * floor — without that check the rename would SUCCEED into the
    * retired slot (vacuum deleted that manifest, so the exists-guard no
    * longer refuses) and resurrect a version whose data files are gone. */
  final class CommitConflictException(msg: String)
      extends IllegalStateException(msg)

  private def floorPath(dir: String): Path =
    new Path(dir, "_manifests/_floor")

  /** lowest LIVE version per the last vacuum (0 = nothing retired).
    * Torn/missing reads degrade to 0 — the check is then skipped, which
    * is the pre-floor behavior, never a new failure mode. */
  private def retentionFloorAt(fs: FileSystem, fp: Path): Long =
    try {
      if (fs.exists(fp)) readSmall(fs, fp).trim.toLong else 0L
    } catch { case _: Exception => 0L }

  /** tmp + atomic rename, REFUSING an existing target or a vacuumed
    * version number — the commit point, the optimistic-concurrency guard,
    * and the resurrection guard in one place. RESIDUAL CAVEAT (the same
    * family as invariant 3's): a writer that passes the floor check while
    * a concurrent vacuum raises the floor can still land in the retired
    * range — closing it needs a coordinating catalog; the practical rule
    * real formats document is the same: keep retention windows long
    * relative to the longest possible writer stall. (Package-visible so
    * the spec can drive the conflict branch directly.) */
  private[graft] def writeManifestAtomic(fs: FileSystem, p: Path,
      content: String): Unit = {
    fs.mkdirs(p.getParent)
    def conflict(why: String): Nothing =
      throw new CommitConflictException(
        s"Snapshots: manifest $p $why; re-read the table and retry " +
          "(optimistic concurrency)")
    val vOfP = p.getName.stripPrefix("v").stripSuffix(".txt")
    if (vOfP.nonEmpty && vOfP.forall(_.isDigit) &&
        vOfP.toLong <= retentionFloorAt(fs, new Path(p.getParent, "_floor")))
      conflict("targets a version at or below the vacuum retention " +
        "floor — this writer stalled past the retention window")
    if (fs.exists(p)) conflict("already exists — a concurrent writer " +
      "committed this version first")
    val tmp = new Path(p.getParent, s".tmp_${p.getName}_${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val renamed = try fs.rename(tmp, p) catch { case _: Throwable => false }
    if (!renamed) {
      fs.delete(tmp, false)
      conflict("already exists — a concurrent writer committed this " +
        "version first")
    }
  }

  /** Read the table at `version` (-1 = latest) as ONE parquet scan: the
    * manifest IS the scan plan — its (value, dir) entries are served to
    * Spark as a supplied partition spec ([[Bridge.manifestScan]]), so the
    * plan holds a single FileSourceScan node no matter how many
    * partitions the manifest lists, a filter on `partCol` prunes entries
    * before any data file is opened, and the recorded schema header means
    * planning reads no parquet footers. Concurrent commits (which only
    * ADD dirs and manifests) cannot perturb a pinned reader. */
  def read(s: SparkSession, dir: String, partCol: String,
      version: Long = -1L): DataFrame = {
    val v = if (version < 0) currentVersion(s, dir) else version
    require(v >= 1, s"Snapshots: no committed version to read at $dir")
    val (schemaOpt, entries) = readManifestFull(s, dir, v)
    // header-less manifests (none are written anymore): one footer read
    val dataSchema = schemaOpt.getOrElse(s.read.parquet(entries.head.path).schema)
    Bridge.manifestScan(s, entries.map(e => (e.value, e.path)), partCol,
      dataSchema)
  }

  /** [[read]] restricted to `values` — MANIFEST-level partition pruning:
    * excluded entries never reach the file index, so they cost no
    * LISTING either (a `.filter(partCol)` on [[read]] prunes splits after
    * the index listed every entry's dir; this prunes before — the
    * log-level predicate real formats apply, and the difference between
    * O(selected) and O(table) metadata calls at 10^4 partitions).
    * Values absent from the manifest are simply empty, like any
    * partition filter. */
  def readPartitions(s: SparkSession, dir: String, partCol: String,
      values: Set[String], version: Long = -1L): DataFrame = {
    require(values.nonEmpty, "Snapshots: readPartitions needs >= 1 value")
    val v = if (version < 0) currentVersion(s, dir) else version
    require(v >= 1, s"Snapshots: no committed version to read at $dir")
    val (schemaOpt, entries) = readManifestFull(s, dir, v)
    val dataSchema = schemaOpt.getOrElse(s.read.parquet(entries.head.path).schema)
    val picked = entries.filter(e => values(e.value))
    if (picked.isEmpty)
      Bridge.manifestScan(s, entries.headOption.toSeq.map(e => (e.value, e.path)),
        partCol, dataSchema).limit(0)
    else
      Bridge.manifestScan(s, picked.map(e => (e.value, e.path)), partCol,
        dataSchema)
  }

  /** Full-snapshot commit: write `df` partitioned by `partCol` into a
    * fresh immutable data dir, manifest every written partition,
    * commit via the atomic manifest rename. Returns the new version. */
  def commit(s: SparkSession, dir: String, df: DataFrame,
      partCol: String): Long =
    commitImpl(s, dir, df, partCol, carryUntouched = false, Set.empty, None)

  /** Optimistic-concurrency retry loop — the user-facing half of
    * invariant 3 (the conflict error says "re-read the table and retry";
    * this is that loop, done right). Each attempt resolves the current
    * version, hands it to `make` (which reads the table AT that version
    * to build the next state), and commits PINNED to exactly
    * version+1 — never a re-derived latest, so a racer landing between
    * the read and the rename makes the attempt FAIL LOUDLY and retry
    * against the racer's state instead of silently committing a state
    * that never saw it (the lost-update anomaly a naive
    * read-then-commit loop has). `prev` = 0 means the table is empty.
    * Throws after `attempts` consecutive lost races. */
  def commitRetry(s: SparkSession, dir: String, partCol: String,
      attempts: Int = 5, replace: Boolean = false,
      replacedValues: Set[String] = Set.empty)(
      make: Long => DataFrame): Long = {
    require(attempts >= 1, "commitRetry needs at least one attempt")
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      val prev = currentVersion(s, dir)
      try
        return commitImpl(s, dir, make(prev), partCol,
          carryUntouched = replace, replacedValues, expectedPrev = Some(prev))
      catch {
        case e: Throwable if isCommitRace(e) => last = e; i += 1
      }
    }
    throw new IllegalStateException(
      s"Snapshots: commit lost $attempts consecutive optimistic races at " +
        s"$dir — a hotter writer is live; back off or coordinate", last)
  }

  /** a lost race is EXACTLY a manifest-rename refusal (per-writer-unique
    * data dirs removed the shared-dir collision surface); anything else —
    * including unrelated "already exists" errors from the caller's own
    * transform — propagates immediately instead of burning retries */
  private def isCommitRace(e: Throwable): Boolean =
    e.isInstanceOf[CommitConflictException]

  /** Partition-level change feed between two committed versions — the
    * incremental-consumption primitive: the scan is bounded by CHANGED
    * partitions, never table size (carry-by-reference means an untouched
    * partition lists the SAME immutable path in both manifests, so it is
    * excluded by metadata comparison alone — zero IO). Emits the
    * from-version's rows of rewritten/dropped partitions labeled
    * `change = 'removed'` and the to-version's rows of rewritten/added
    * partitions labeled `change = 'added'`; a downstream job re-derives
    * exactly the affected partitions' state. (Partition-level, not
    * row-level: a rewrite-based format records no row lineage, so a
    * row-level CDF would need an anti-join the consumer can do itself on
    * this bounded frame. Undefined across a full-rewrite schema change —
    * the union fails loudly on the mismatched schemas.) */
  def diff(s: SparkSession, dir: String, partCol: String,
      fromV: Long, toV: Long): DataFrame = {
    require(fromV >= 1 && toV > fromV,
      s"Snapshots: diff needs 1 <= fromV < toV, got $fromV..$toV")
    val (fSchema, from) = readManifestFull(s, dir, fromV)
    val (tSchema, to) = readManifestFull(s, dir, toV)
    val fromPaths = from.map(e => e.value -> e.path).toMap
    val toPaths = to.map(e => e.value -> e.path).toMap
    val removed = from.filter(e => !toPaths.get(e.value).contains(e.path))
    val added = to.filter(e => !fromPaths.get(e.value).contains(e.path))
    def side(sch: Option[StructType], entries: Seq[Entry], label: String,
        emptyFallback: Seq[Entry]) = {
      val schema = sch.getOrElse(
        s.read.parquet(emptyFallback.head.path).schema)
      val es = if (entries.nonEmpty) entries else emptyFallback
      val df = Bridge.manifestScan(s, es.map(e => (e.value, e.path)),
        partCol, schema)
      (if (entries.nonEmpty) df else df.limit(0))
        .withColumn("change", lit(label))
    }
    side(fSchema, removed, "removed", from)
      .unionByName(side(tSchema, added, "added", to))
  }

  /** Partition-level rewrite commit (the backfill/OPTIMIZE/MERGE shape):
    * partitions present in `df` get fresh data dirs; every OTHER
    * partition of the previous version is carried into the new manifest
    * BY REFERENCE — zero data movement for untouched partitions, and the
    * previous version keeps reading its own files.
    *
    * `replacedValues` names partition values that are REPLACED even if
    * `df` holds no rows for them — i.e. the partition becomes EMPTY in
    * the new version (its entry is dropped, not carried). Without it, a
    * rewrite that legitimately deletes a partition's every row would be
    * indistinguishable from "untouched" and the stale partition would be
    * silently carried forward — the delete-all hole a MERGE fold hits. */
  def commitReplace(s: SparkSession, dir: String, df: DataFrame,
      partCol: String, replacedValues: Set[String] = Set.empty): Long =
    commitImpl(s, dir, df, partCol, carryUntouched = true, replacedValues, None)

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
    * manifest check, never with half-read data. Data dirs numbered ABOVE
    * the latest committed version are never touched — that is an
    * in-flight writer whose commit may still succeed; dirs at or below it
    * that no kept manifest references are either retired history or
    * orphans of losers whose rename can no longer succeed, both safe.
    * Metadata cost: ONE `_manifests` listing (so already-retired history
    * is skipped for free — a repeat vacuum with a wider window is a
    * no-op) plus one manifest read per KEPT version. Returns the dropped
    * versions. */
  def vacuum(s: SparkSession, dir: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "vacuum keeps at least one version")
    val fs = fsOf(s, dir)
    val existing = listVersions(fs, dir)
    if (existing.isEmpty) return Seq.empty
    val cur = existing.last
    val oldest = math.max(1L, cur - keepLast + 1)
    val kept = existing.filter(_ >= oldest)
      .flatMap(v => readManifestFull(s, dir, v)._2).map(_.path).toSet
    val dropped = existing.filter(_ < oldest)
    // raise the retention floor BEFORE any manifest disappears: once a
    // manifest is deleted its version number must never be committable
    // again (a stalled writer's rename into the freed slot would
    // resurrect a version whose data this vacuum deletes below) —
    // writeManifestAtomic refuses versions <= floor
    if (dropped.nonEmpty) {
      // monotone: a later vacuum with a WIDER window must not regress it
      val floor = math.max(oldest - 1, retentionFloorAt(fs, floorPath(dir)))
      val out = fs.create(floorPath(dir), true)
      try out.write(floor.toString.getBytes("UTF-8"))
      finally out.close()
    }
    dropped.foreach(v => fs.delete(manifestPath(dir, v), false))
    val dataRoot = new Path(dir, "data")
    if (fs.exists(dataRoot)) {
      fs.listStatus(dataRoot).foreach { vd =>
        // NEVER touch a version dir numbered above the latest COMMITTED
        // version: that is an IN-FLIGHT writer's data (parquet written,
        // manifest rename pending) whose commit may legitimately succeed
        // after this vacuum — deleting it would commit a version with
        // missing files. Dirs at <= cur are safe: either referenced by a
        // kept manifest (protected below), retired history, or a loser's
        // orphan whose rename can no longer succeed (its version's
        // manifest already exists).
        val vNum = vd.getPath.getName match {
          case n if n.startsWith("v") =>
            val digits = n.stripPrefix("v").takeWhile(_.isDigit)
            if (digits.nonEmpty) digits.toLong else Long.MaxValue
          case _ => Long.MaxValue
        }
        if (vd.isDirectory && vNum <= cur) {
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

  /** OPTIMIZE-as-version: compact the CURRENT version's small files into
    * a new atomic commit. Partitions holding more than `maxFilesPerPart`
    * data files are read back (one scan over just those entries) and
    * rewritten bin-packed toward `targetFileBytes` per output file —
    * ceil(partitionBytes / targetFileBytes) bins per partition, rows
    * spread across bins by a deterministic row hash, one shuffle total.
    * Every other partition is carried BY REFERENCE, and every prior
    * version keeps reading its own files (compaction must never change
    * an answer — the read-back of version N+1 equals version N row for
    * row, which q_layout_optimize pins under the oracle hash and
    * SnapshotsSpec pins as file-count-drops/content-hash-doesn't).
    * `clusterBy` column NAMES switch the rewrite to OPTIMIZE-CLUSTER-BY:
    * range-partitioned + sorted output so every rewritten file carries a
    * narrow min/max range on the cluster key (zonemap/row-group pruning
    * food). For 2-D clustering, either list both columns (lexicographic —
    * leading-column pruning) or materialize a
    * [[graft.api.Graft.zorderKey]] as a stored column at write time and
    * name it here (true Morton locality needs the key ON the table, as
    * real formats' Z-ORDER implementations compute-and-keep it). No-op
    * (returns the current version, no commit) when nothing
    * qualifies. Candidate selection is METADATA-ONLY: per-partition file
    * counts and byte sizes were recorded in the manifest when each
    * immutable dir was written (the Delta add-action shape), so deciding
    * what to compact costs one small manifest read — no per-partition
    * listings, no matter how many partitions the table holds. (Legacy
    * entries without recorded stats fall back to one listing each.) */
  def optimize(s: SparkSession, dir: String, partCol: String,
      maxFilesPerPart: Int = 1, targetFileBytes: Long = 128L << 20,
      clusterBy: Seq[String] = Nil): Long = {
    require(maxFilesPerPart >= 1, "maxFilesPerPart >= 1")
    val fs = fsOf(s, dir)
    val cur = currentVersion(s, dir)
    require(cur >= 1, s"Snapshots: nothing to optimize at $dir")
    val (schemaOpt, entries) = readManifestFull(s, dir, cur)
    val stats = entries.map {
      case e if e.files >= 0 => e
      case e => // legacy entry: stats unrecorded, list once
        val fst = dataFiles(fs, new Path(e.path))
        e.copy(files = fst.length, bytes = fst.map(_.getLen).sum)
    }
    // CONVERGENCE: a partition already at (or within one file of) its
    // bin-pack fixpoint — ceil(bytes/target) files — is exempt even when
    // that exceeds maxFilesPerPart, or a large partition would be
    // re-selected and fully rewritten into the same layout on every
    // nightly run forever (history churn, vacuum load, zero benefit).
    // The +1 slack absorbs the clusterBy path's worst case: a
    // partition's rows are one CONTIGUOUS block of the global range
    // order (partCol leads the sort key), so range boundaries can
    // straddle it into at most ideal+1 files — without the slack that
    // straddle would re-qualify it forever.
    val cands = stats.filter { e =>
      val ideal = (e.bytes + targetFileBytes - 1) / targetFileBytes
      e.files > math.max(maxFilesPerPart.toLong,
        if (ideal > 1 || clusterBy.nonEmpty) ideal + 1 else ideal)
    }
    if (cands.isEmpty) return cur
    val dataSchema = schemaOpt.getOrElse(s.read.parquet(entries.head.path).schema)
    val binsOf = cands.map(e => e.value ->
      math.max(1L, (e.bytes + targetFileBytes - 1) / targetFileBytes)).toMap
    val src = Bridge
      .manifestScan(s, cands.map(e => (e.value, e.path)), partCol, dataSchema)
    val packed =
      if (clusterBy.nonEmpty) {
        // OPTIMIZE ... ZORDER/CLUSTER BY: range-partition the rewrite on
        // (partition, cluster key) and sort within tasks, so every output
        // file carries a NARROW, near-disjoint min/max range on the
        // cluster columns — compaction and zonemap-friendly clustering in
        // one pass (compose with Graft.zorderKey for 2-D keys). Costs the
        // range sampler's extra pass over just the rewritten entries.
        val n = math.min(binsOf.values.sum, Int.MaxValue.toLong).toInt
        val keys = (partCol +: clusterBy).map(col)
        src.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*)
      } else {
        // plain bin-packing: deterministic row-hash spread across each
        // partition's ceil(bytes/target) bins, ONE hash shuffle, no
        // sampling pass. Per-partition bin counts ride a BROADCAST join,
        // not a map() literal — a 10^4-candidate OPTIMIZE must not build
        // a 2*10^4-arg expression tree (the same plan-size rule the
        // manifest-served read exists for).
        val bins = {
          import s.implicits._
          binsOf.toSeq.toDF("__graft_bin_part", "__graft_bins")
        }
        src.join(broadcast(bins), col(partCol) === col("__graft_bin_part"))
          .withColumn("__graft_bin",
            pmod(xxhash64(dataSchema.fieldNames.map(col).toSeq: _*),
              col("__graft_bins")))
          .repartition(col(partCol), col("__graft_bin"))
          .drop("__graft_bin", "__graft_bins", "__graft_bin_part")
      }
    // PINNED to the version the candidates were planned from: a racer
    // landing between the plan and the rename must fail this commit
    // loudly (rerun optimize against the new state), never have its
    // update silently replaced by a compaction of older data — the same
    // lost-update rule commitRetry documents
    commitImpl(s, dir, packed, partCol, carryUntouched = true, Set.empty,
      expectedPrev = Some(cur))
  }

  /** data files of one partition dir (excludes _SUCCESS/.hidden) */
  private def dataFiles(fs: FileSystem,
      p: Path): Array[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  private def commitImpl(s: SparkSession, dir: String, df: DataFrame,
      partCol: String, carryUntouched: Boolean,
      replacedValues: Set[String], expectedPrev: Option[Long]): Long = {
    require(df.schema(partCol).dataType == StringType,
      s"Snapshots: partition column '$partCol' must be StringType (it " +
        "travels through directory names and manifest lines as a string; " +
        s"got ${df.schema(partCol).dataType.simpleString} — cast it)")
    val dataSchema = StructType(df.schema.filterNot(_.name == partCol))
    val fs = fsOf(s, dir)
    // commitRetry PINS the version it read through `make` — re-deriving
    // latest here would let a racer's commit slide underneath unseen
    val prev = expectedPrev.getOrElse(currentVersion(s, dir))
    val v = prev + 1
    // the data dir is PER-WRITER UNIQUE (version prefix + nonce), never
    // shared by name across racers: two writers targeting version N write
    // disjoint dirs and race ONLY at the manifest rename — a shared
    // data/vN would let mode("error")'s check-then-write window interleave
    // both writers' files into one dir and hand the rename winner a
    // corrupt version (why real formats name data files per task attempt).
    // The loser's orphan dir is unreferenced by every manifest and retired
    // by the next vacuum. The nonce is a UUID — collision-proof, so the
    // mode("error") guard below is immutability belt only, never a race
    // surface; immutability (invariant 1) is per-dir as before.
    val dataDir = f"$dir/data/v$v%08d_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    df.write.mode("error").partitionBy(partCol).parquet(dataDir)
    val written = fs.listStatus(new Path(dataDir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(partCol + "="))
      .map { st =>
        val raw = st.getPath.getName.stripPrefix(partCol + "=")
        // a NULL partition value writes Hive's default-partition dir; a
        // read-back would silently RE-TYPE it as that literal string —
        // refuse loudly instead (impute or filter nulls before committing)
        if (raw == "__HIVE_DEFAULT_PARTITION__") {
          fs.delete(new Path(dataDir), true)
          throw new IllegalArgumentException(
            s"Snapshots: partition column '$partCol' contains NULL rows " +
              "(written as __HIVE_DEFAULT_PARTITION__); a read-back would " +
              "silently turn NULL into that literal string — filter or " +
              "impute nulls before committing")
        }
        // the EXACT inverse of the writer's escaping (%XX only) — NOT
        // java.net.URLDecoder, which also rewrites literal '+' to a
        // space the writer never escaped (silent value corruption and
        // "a+b"/"a b" conflation)
        val value = Bridge.unescapePathName(raw)
        def refuse(why: String): Nothing = {
          fs.delete(new Path(dataDir), true)
          throw new IllegalArgumentException(
            s"Snapshots: partition value cannot $why (dir name: $raw)")
        }
        if (value.exists(c => c == '\t' || c == '\n'))
          refuse("contain a tab/newline — the line-oriented manifest " +
            "cannot carry it")
        // '#' would make the value's manifest line ambiguous with the
        // first-line schema header
        if (value.startsWith("#"))
          refuse("start with '#' — reserved for the manifest header")
        // record the dir's file stats NOW — the dir is immutable, so
        // they are exact forever and replace commits carry them verbatim
        val fst = dataFiles(fs, st.getPath)
        Entry(value, st.getPath.toString, fst.length, fst.map(_.getLen).sum)
      }
    val replaced = written.map(_.value).toSet ++ replacedValues
    val carried =
      if (!carryUntouched || prev == 0) Nil
      else {
        val (prevSchema, prevEntries) = readManifestFull(s, dir, prev)
        val stay = prevEntries.filterNot(e => replaced(e.value))
        // the SCHEMA CONTRACT, enforced where it can fail loudly and
        // early: mixing file schemas within one version is refused at
        // commit. Name+type equality; column order and nullability are
        // free (parquet resolves by name).
        if (stay.nonEmpty) prevSchema.foreach { ps =>
          // compare WIDENED types: nested nullability differences (an
          // outer join making a struct field nullable, say) are not a
          // schema change any more than top-level ones are
          val a = widenStruct(ps).fields
            .map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
          val b = widenStruct(dataSchema).fields
            .map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
          if (a != b) {
            // the just-written (unreferenced) data dir must not survive a
            // refused commit — a retry would trip mode("error") on it
            fs.delete(new Path(dataDir), true)
            throw new IllegalArgumentException(
              "Snapshots: commitReplace would mix data schemas within one " +
                s"version (carried entries keep ${ps.simpleString}, new data " +
                s"is ${dataSchema.simpleString}); schema evolution requires a " +
                "full-snapshot commit")
          }
        }
        stay
      }
    val entries = (carried ++ written).sortBy(_.value)
    require(entries.nonEmpty, "Snapshots: refusing to commit an empty table")
    // the header is the READ schema for every file the version lists —
    // carried files may hold nulls even when THIS commit's frame is
    // non-nullable (nullability, nested included, is deliberately
    // outside the schema contract), so record it nullability-WIDENED
    // recursively: a false non-null guarantee would let the optimizer
    // fold IsNull to false over real nulls, silently wrong results
    val headerSchema = widenStruct(dataSchema)
    writeManifestAtomic(fs, manifestPath(dir, v),
      (SchemaHeader + headerSchema.json) +: entries.map(_.line) mkString "\n")
    // best-effort advisory hint (see currentVersion) — never load-bearing
    try {
      val out = fs.create(hintPath(dir), true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    } catch { case _: Exception => () }
    v
  }
}
