package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A message-bus emulation with Kafka's CONTRACT — a topic of N
  * append-only partitions, each record addressed by (partition, offset),
  * consumed via explicit offset ranges that a checkpoint can replay
  * deterministically — implemented as a DataSource V2 `MicroBatchStream`
  * over plain files (one `p<i>.log` per partition, offset = line number).
  *
  * This is the partitioned/replayable rung of the ingestion ladder above
  * the at-most-once `socket` source (see [[Streaming.socketIngest]]): the
  * reference's framed-socket ingest (`robust_socket_io.py:16-112`,
  * `tools.py:71-99`) has neither partitions nor offsets, so a crashed
  * reader loses in-flight records; here the source's `initialOffset` /
  * `latestOffset` / `planInputPartitions(start, end)` are pure functions
  * of the log, so any batch can be re-planned bit-identically after a
  * crash — exactly-once end-to-end with a checkpointed sink. Swap
  * `format(classOf[FileBusProvider].getName)` for `format("kafka")` and
  * the query is production Kafka ingestion unchanged.
  *
  * Supported options:
  *  - `path` (required): topic directory
  *  - `startingOffsets`: `earliest` (default) or a JSON map
  *    `{"0":12,"1":5}` of first offset to read per partition
  *  - `maxRecordsPerTrigger`: admission control — cap on new records per
  *    micro-batch, allocated lag-proportionally across partitions
  *    (deterministic; no partition starves while others have backlog)
  *
  * Scale design: one `InputPartition` per bus partition, so read
  * parallelism is the topic's partition count (Kafka's own model); the
  * driver holds only the O(partitions) offset map, never records. A real
  * deployment points the same scan at object-store segment files.
  */
object FileBus {
  // fields are declared nullable (values are never null in practice) so
  // AppendData's by-name resolution accepts ordinary nullable projections
  // on the WRITE side — the sink validates actual nulls per record
  val schema: StructType = new StructType()
    .add("partition", IntegerType)
    .add("offset", LongType)
    .add("value", StringType)

  def createTopic(dir: String, partitions: Int): Unit = {
    require(partitions >= 1, s"need >=1 partition, got $partitions")
    Files.createDirectories(Paths.get(dir))
    (0 until partitions).foreach { p =>
      val f = Paths.get(dir, s"p$p.log")
      if (!Files.exists(f)) Files.createFile(f)
    }
  }

  /** Append records to one partition (newline-framed; a record must not
    * contain '\n' OR '\r' — BufferedReader.readLine splits on both, so a
    * stray CR would desync offset accounting and break the bit-identical
    * replay contract). Returns the base offset of the appended range.
    *
    * Writer contract (Kafka's model — ONE leader owns a partition's log):
    * within this JVM, appends to the same partition are serialized by a
    * per-file lock, so concurrent producers get disjoint offset ranges;
    * ACROSS processes the contract is single-writer-per-partition — two
    * processes appending to one p*.log would interleave bytes and offsets
    * exactly as two rogue brokers would. */
  def append(dir: String, partition: Int, records: Seq[String]): Long = {
    require(records.forall(r => !r.contains('\n') && !r.contains('\r')),
      "records are line-framed: no \\n or \\r inside a record")
    val f = Paths.get(dir, s"p$partition.log")
    val key = f.toAbsolutePath.toString
    val lock = appendLocks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      val base = lineCount(f)
      val payload = records.map(_ + "\n").mkString
      Files.write(f, payload.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      // the appended byte/line counts are known exactly — keep the
      // (size -> lines) cache current without re-reading anything
      countCache.put(key, (Files.size(f), base + records.size))
      base
    }
  }

  /** Append pre-framed bytes (each record already '\n'-terminated, count
    * known by the caller) to one partition under the same per-partition
    * lock and cache discipline as [[append]] — the sink's commit path,
    * which moves staged task output into the log without re-parsing it.
    * Returns the base offset of the appended range. */
  private[streaming] def appendRaw(dir: String, partition: Int,
      payload: Array[Byte], nRecords: Long): Long = {
    val f = Paths.get(dir, s"p$partition.log")
    val key = f.toAbsolutePath.toString
    val lock = appendLocks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      val base = lineCount(f)
      Files.write(f, payload,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      countCache.put(key, (Files.size(f), base + nRecords))
      base
    }
  }

  def partitions(dir: String): Seq[Int] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    val ls = Files.list(d) // must close: this runs on EVERY trigger
    try
      ls.iterator().asScala
        .map(_.getFileName.toString)
        .filter(s => s.startsWith("p") && s.endsWith(".log"))
        // non-numeric p*.log (e.g. a stray "pending.log") is not a
        // partition — skip it rather than crash-loop the stream
        .flatMap(_.stripPrefix("p").stripSuffix(".log").toIntOption)
        .toSeq.sorted
    finally ls.close()
  }

  private val appendLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  /** path -> (file length, newline count up to that length). Logs are
    * append-only, so a cached prefix count is EXACT: newline counting is
    * position-independent (count[0,size) = count[0,len) + count[len,size))
    * and needs no line-boundary alignment. Keeps `endOffsets` — which the
    * driver calls on EVERY trigger — at O(new bytes) instead of O(log). */
  private val countCache = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  /** instrumentation: total bytes scanned by [[lineCount]] (FileBusSpec
    * asserts a no-append trigger scans zero bytes) */
  private[graft] val scanBytes = new java.util.concurrent.atomic.AtomicLong

  private[streaming] def lineCount(f: java.nio.file.Path): Long = {
    if (!Files.exists(f)) return 0L
    val key = f.toAbsolutePath.toString
    val size = Files.size(f)
    val cached = countCache.get(key)
    if (cached != null && cached._1 == size) return cached._2
    // truncation (cached len > size) voids the cache: full rescan
    val (from, base) =
      if (cached != null && cached._1 < size) cached else (0L, 0L)
    val ch = java.nio.channels.FileChannel.open(f, StandardOpenOption.READ)
    try {
      ch.position(from)
      // scan exactly [from, size): a writer racing past the snapshot must
      // not leak extra lines into a count cached as "size"
      var remaining = size - from
      val buf = java.nio.ByteBuffer.allocate(64 * 1024)
      var n = base
      while (remaining > 0) {
        buf.clear()
        if (remaining < buf.capacity()) buf.limit(remaining.toInt)
        val read = ch.read(buf)
        if (read <= 0) remaining = 0
        else {
          scanBytes.addAndGet(read)
          var i = 0
          while (i < read) { if (buf.get(i) == '\n') n += 1; i += 1 }
          remaining -= read
        }
      }
      countCache.put(key, (size, n))
      n
    } finally ch.close()
  }

  /** current end offsets (exclusive) per partition */
  def endOffsets(dir: String): Map[Int, Long] =
    partitions(dir).map(p => p -> lineCount(Paths.get(dir, s"p$p.log"))).toMap
}

/** Offset = end-exclusive line position per partition, stable JSON with
  * numerically-sorted keys so equal offsets serialize identically (the
  * offset log compares serialized forms). */
case class FileBusOffset(counts: Map[Int, Long]) extends Offset {
  override def json(): String =
    counts.toSeq.sortBy(_._1)
      .map { case (p, n) => "\"" + p + "\":" + n }.mkString("{", ",", "}")
}

object FileBusOffset {
  /** Strict: a malformed offset map must fail the query at start, not
    * silently parse to {} (= replay everything from 0 — the opposite of
    * what a typo'd `startingOffsets` asked for). */
  def parse(json: String): FileBusOffset = {
    val t = json.trim
    require(t.startsWith("{") && t.endsWith("}"),
      s"filebus offsets must be a JSON object like {\"0\":12}, got: $json")
    val pair = "\"(\\d+)\"\\s*:\\s*(\\d+)".r
    val entries = pair.findAllMatchIn(t)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toSeq
    // strictness is all-or-nothing: stripping every well-formed
    // "<digits>":<digits> pair (plus commas/whitespace) must leave bare
    // braces — otherwise {"0":1,"oops":x} would silently parse to {0:1}
    // and replay partition "oops"'s typo'd twin from 0, the exact
    // failure fail-fast exists to prevent
    val residue = pair.replaceAllIn(t, "").replaceAll("[,\\s]", "")
    require(residue == "{}",
      s"filebus offsets contain malformed entries (want \"<partition>\":<offset>): $json")
    require(entries.map(_._1).distinct.size == entries.size,
      s"filebus offsets repeat a partition key: $json")
    FileBusOffset(entries.toMap)
  }
}

class FileBusProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = FileBus.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new FileBusTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("filebus: option 'path' is required")))
}

class FileBusTable(dir: String) extends Table with SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"filebus:$dir"
  override def schema(): StructType = FileBus.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new FileBusScan(dir, options.asCaseSensitiveMap().asScala.toMap)
    }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    : org.apache.spark.sql.connector.write.WriteBuilder =
    new FileBusWriteBuilder(dir, info)
}

class FileBusScan(dir: String, options: Map[String, String]) extends Scan {
  private def opt(k: String): Option[String] =
    options.collectFirst { case (key, v) if key.equalsIgnoreCase(k) => v }
  override def readSchema(): StructType = FileBus.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FileBusMicroBatchStream(dir,
      opt("startingOffsets").getOrElse("earliest"),
      opt("maxRecordsPerTrigger").map(_.toLong))
  /** batch parity: the full log as a static table (start-to-end scan) */
  override def toBatch(): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      FileBus.endOffsets(dir).toSeq.sortBy(_._1)
        .map { case (p, n) => FileBusRange(s"$dir/p$p.log", p, 0L, n): InputPartition }
        .toArray
    override def createReaderFactory(): PartitionReaderFactory = FileBusReaderFactory
  }
}

class FileBusMicroBatchStream(dir: String, startingOffsets: String,
    maxRecordsPerTrigger: Option[Long])
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow: the end offsets are SNAPSHOTTED at query start
  // and every admission decision is bounded by that snapshot, so the
  // query drains exactly the records that existed at start (in
  // rate-limited micro-batches) and terminates — records appended during
  // the drain wait for the next run. Null when running under a normal
  // trigger.
  @volatile private var availableNowCap: Map[Int, Long] = null
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = FileBus.endOffsets(dir)
  private def currentEnd(): Map[Int, Long] = {
    val end = FileBus.endOffsets(dir)
    val cap = availableNowCap
    if (cap == null) end
    else end.map { case (p, e) => p -> math.min(e, cap.getOrElse(p, 0L)) }
  }

  override def initialOffset(): Offset =
    if (startingOffsets.equalsIgnoreCase("earliest"))
      FileBusOffset(FileBus.partitions(dir).map(_ -> 0L).toMap)
    else if (startingOffsets.equalsIgnoreCase("latest"))
      FileBusOffset(FileBus.endOffsets(dir)) // only records appended after start
    else FileBusOffset.parse(startingOffsets)

  override def latestOffset(): Offset = FileBusOffset(currentEnd())

  override def getDefaultReadLimit: ReadLimit =
    maxRecordsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  /** Admission control: advance each partition toward its end, allocating
    * the row quota PROPORTIONALLY to per-partition lag (Kafka's
    * `maxOffsetsPerTrigger` model) — index-order spending would drain
    * partition 0 fully before partition 1 saw a row, so a sustained
    * backlog larger than the cap starves the high-index tail forever.
    *
    * Allocation is a pure function of (start, end, quota), so a replayed
    * trigger plans the identical range:
    *  1. min-1 pre-pass in index order — whenever quota >= the number of
    *     lagging partitions, EVERY lagging partition admits >= 1 record
    *     (no starvation);
    *  2. floor-proportional share of the remaining quota by remaining lag
    *     (BigInt math — no overflow for any quota x lag);
    *  3. the leftover (< #lagging, from the floors) lands 1-at-a-time in
    *     index order on partitions with headroom, cycling until spent. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[FileBusOffset].counts
    val end = currentEnd()
    val parts = (end.keySet ++ from.keySet).toSeq.sorted
    // clamp at 0: a startingOffset past the log end must not go NEGATIVE
    // (which would inflate the quota and regress the offset below start)
    val lag = parts.map { p =>
      p -> math.max(0L, end.getOrElse(p, 0L) - from.getOrElse(p, 0L))
    }.toMap
    def advanceBy(take: Map[Int, Long]): FileBusOffset =
      FileBusOffset(parts.map { p =>
        p -> (math.max(end.getOrElse(p, 0L), from.getOrElse(p, 0L))
          - lag(p) + take.getOrElse(p, 0L))
      }.toMap)
    limit match {
      case mr: ReadMaxRows if lag.valuesIterator.sum > mr.maxRows() =>
        val quota = mr.maxRows()
        val lagging = parts.filter(lag(_) > 0)
        val alloc = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
        var q = quota
        lagging.foreach { p => if (q > 0) { alloc(p) = 1L; q -= 1 } }
        val rem = lagging.map(p => p -> (lag(p) - alloc(p))).filter(_._2 > 0)
        val remTotal = rem.iterator.map(_._2).sum
        if (q > 0 && remTotal > 0) {
          val q0 = q
          rem.foreach { case (p, l) =>
            val share = math.min((BigInt(q0) * l / remTotal).toLong, l)
            alloc(p) += share
            q -= share
          }
          while (q > 0) // total headroom >= q, so this terminates
            lagging.foreach { p =>
              if (q > 0 && alloc(p) < lag(p)) { alloc(p) += 1; q -= 1 }
            }
        }
        advanceBy(alloc.toMap)
      case _ =>
        // allAvailable, or a cap the whole backlog fits under: take it all
        // (monotone even if a start offset sits past the current log end)
        advanceBy(lag)
    }
  }

  override def reportLatestOffset(): Offset = latestOffset()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FileBusOffset].counts
    val e = end.asInstanceOf[FileBusOffset].counts
    e.toSeq.sortBy(_._1).flatMap { case (p, eo) =>
      val so = s.getOrElse(p, 0L)
      if (eo > so) Some(FileBusRange(s"$dir/p$p.log", p, so, eo): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = FileBusReaderFactory
  override def deserializeOffset(json: String): Offset = FileBusOffset.parse(json)
  override def commit(end: Offset): Unit = () // log retention is external
  override def stop(): Unit = ()
}

/** one bus partition's [start, end) line range — the unit of parallelism */
case class FileBusRange(path: String, partition: Int, start: Long, end: Long)
  extends InputPartition

object FileBusReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[FileBusRange]
    new PartitionReader[InternalRow] {
      private val reader = Files.newBufferedReader(
        Paths.get(r.path), StandardCharsets.UTF_8)
      private var pos = 0L
      // skip to the range start; a bus segment read is sequential anyway
      while (pos < r.start && reader.readLine() != null) pos += 1
      private var line: String = null
      override def next(): Boolean = {
        if (pos >= r.end) return false
        line = reader.readLine()
        if (line == null) return false // log truncated under us: stop cleanly
        pos += 1
        true
      }
      override def get(): InternalRow =
        InternalRow(r.partition, pos - 1, UTF8String.fromString(line))
      override def close(): Unit = reader.close()
    }
  }
}
