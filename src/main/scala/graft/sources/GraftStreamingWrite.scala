package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, UnsafeProjection}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{StringType, StructType}

/** One committed epoch's files, shipped from a writer task to the
  * driver inside the task commit message: (encoded partition value,
  * absolute path, exact byte length, per-column [min,max] bounds in
  * the manifest's canonical string form) per file — everything a
  * manifest entry records, so the epoch commit does zero listings AND
  * zero footer reads: the writer tracked the bounds row by row as it
  * wrote (the StatsCommitProtocol idea taken one step further — no
  * footer pass at all). */
private[sources] final case class GraftStreamMsg(
    files: Seq[(String, String, Long, Map[String, (String, String)])])
    extends WriterCommitMessage

/** The `writeStream.toTable("graft.db.t")` sink — a real DSv2
  * [[StreamingWrite]] over the snapshot format:
  *
  *  - writer TASKS stream rows straight into per-partition parquet
  *    files via Spark's own parquet `OutputWriter` (the identical
  *    write support the batch path uses — same encodings, same footer
  *    shape), under the staging dir
  *    `data/v00000000_stream_<queryId>/e<epoch>_<task>/...`;
  *  - each task ships its files' (value, path, bytes, column bounds)
  *    in its commit message — the driver performs ZERO filesystem
  *    calls per epoch and the entries land with real [min,max] stats
  *    (tracked row-by-row in the writer — no footer pass);
  *  - the epoch commit ([[Snapshots.commitStreamedFiles]]) appends ONE
  *    manifest version referencing the files, stamped with the
  *    checkpoint-stable (queryId, epochId) txn — a restart's replayed
  *    epoch deletes its twin files and no-ops, so the sink is
  *    exactly-once end to end (the same stamp discipline
  *    [[Snapshots.commitIdempotent]] pins for the foreachBatch route).
  *
  * The staging dir's `v00000000` prefix puts the files under vacuum's
  * file-grain rule: committed (referenced) files survive, retired
  * history is collected. The documented residue: a vacuum racing an
  * IN-FLIGHT epoch could collect its not-yet-referenced files — the
  * same "retention must exceed the longest writer stall" contract the
  * batch commit documents, with an epoch as the stall unit. */
private[sources] class GraftStreamingWrite(spark: SparkSession,
    dir: String, partCol: String, queryId: String,
    incoming: StructType) extends StreamingWrite {

  private val spec = PartSpec.parse(partCol)
  private val (logicalSchema, physSchema) = Snapshots.writeSchemas(spark, dir)

  locally {
    val expect = logicalSchema.fieldNames.toSeq ++ spec.names
    val missing = expect.filterNot(incoming.fieldNames.contains)
    val unknown = incoming.fieldNames.toSeq.filterNot(expect.contains)
    require(missing.isEmpty && unknown.isEmpty,
      s"graft streaming write: the stream's columns must be exactly the " +
        s"table's (${expect.mkString(", ")}); missing " +
        s"[${missing.mkString(", ")}], unknown [${unknown.mkString(", ")}]")
    spec.cols.foreach { f =>
      require(incoming(f.name).dataType == f.dataType,
        s"graft streaming write: partition column '${f.name}' must be " +
          s"${f.dataType.simpleString}, got " +
          incoming(f.name).dataType.simpleString)
    }
    logicalSchema.fields.foreach { f =>
      require(incoming(f.name).dataType == f.dataType,
        s"graft streaming write: column '${f.name}' must be " +
          s"${f.dataType.simpleString}, got " +
          incoming(f.name).dataType.simpleString)
    }
  }

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    // Spark's own parquet write factory (serializable), prepared with
    // the session's full parquet configuration — compression, timestamp
    // encoding, field-id metadata all match the batch writer's files
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat()
      .prepareWrite(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        job, Map.empty, physSchema)
    import scala.jdk.CollectionConverters._
    val confKVs = job.getConfiguration.iterator().asScala
      .map(e => e.getKey -> e.getValue).toArray
    val staging = s"$dir/data/v00000000_stream_" +
      queryId.replaceAll("[^0-9A-Za-z_-]", "_")
    new GraftStreamWriterFactory(staging, owf, confKVs,
      incoming, logicalSchema, physSchema, spec)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.toSeq.collect { case m: GraftStreamMsg => m.files }
      .flatten
    Snapshots.commitStreamedFiles(spark, dir, partCol, files,
      appId = s"toTable_$queryId", batchId = epochId)
    Snapshots.invalidateCaches(dir)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.toSeq.collect { case m: GraftStreamMsg => m.files }.flatten
      .foreach { case (_, p, _, _) =>
        try fs.delete(new Path(p), false)
        catch { case _: java.io.IOException => () }
      }
  }
}

/** Serializable task-side factory: opens one parquet [[OutputWriter]]
  * per partition value a task encounters, routes each row by the
  * partition columns' external string forms (the directory escaping is
  * byte-identical to the batch writer's), and projects the data
  * columns into the files' PHYSICAL schema. */
private[sources] class GraftStreamWriterFactory(staging: String,
    owf: OutputWriterFactory, confKVs: Array[(String, String)],
    incoming: StructType, logicalSchema: StructType,
    physSchema: StructType, spec: PartSpec)
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val conf = new Configuration(false)
    confKVs.foreach { case (k, v) => conf.set(k, v) }
    val ctx = new TaskAttemptContextImpl(conf,
      new TaskAttemptID(new TaskID(new JobID("graft_stream", 0),
        TaskType.MAP, partitionId), taskId.toInt))
    val ext = owf.getFileExtension(ctx)
    // partition values -> external strings via the real Cast (UTC, the
    // same conversion the manifest index uses)
    val partProj = UnsafeProjection.create(spec.cols.map { f =>
      val i = incoming.fieldIndex(f.name)
      Cast(BoundReference(i, incoming(i).dataType, nullable = true),
        StringType, Some("UTC"))
    })
    // data columns in the files' PHYSICAL field order
    val dataProj = UnsafeProjection.create(logicalSchema.fields.toSeq.map {
      f =>
        val i = incoming.fieldIndex(f.name)
        BoundReference(i, incoming(i).dataType, nullable = true)
    })
    // the columns whose [min,max] the writer tracks row-by-row — the
    // primitive+string subset (no aliasing hazards: primitives copy by
    // value, strings are cloned off the reused UnsafeRow buffer)
    val statsFields: Seq[(Int, org.apache.spark.sql.types.DataType)] =
      physSchema.fields.toSeq.zipWithIndex.collect {
        case (f, i) if GraftStreamWriterFactory.trackable(f.dataType) =>
          (i, f.dataType)
      }

    new DataWriter[InternalRow] {
      private val writers = scala.collection.mutable.Map[
        String, (org.apache.spark.sql.execution.datasources.OutputWriter,
          String)]()
      private val values = scala.collection.mutable.Map[String, String]()
      // per open file: statsFields-indexed running (min, max) over the
      // CATALYST values, folded under the interpreted ordering — NaN
      // floats/doubles skipped (a NaN bound is meaningless, same rule
      // as the footer path)
      private val bounds = scala.collection.mutable.Map[
        String, (Array[Any], Array[Any])]()
      private val ords = statsFields.map { case (_, dt) =>
        org.apache.spark.sql.catalyst.util.TypeUtils
          .getInterpretedOrdering(dt)
      }

      override def write(row: InternalRow): Unit = {
        val pv = partProj(row)
        val raw = spec.cols.indices.map { i =>
          val v = if (pv.isNullAt(i)) null else pv.getUTF8String(i).toString
          if (v == null) throw new IllegalArgumentException(
            s"graft streaming write: partition column " +
              s"'${spec.names(i)}' is NULL — filter or impute nulls " +
              "(the format refuses Hive default partitions)")
          v
        }
        val leaf = spec.names.zip(raw).map { case (n, v) =>
          s"$n=${Bridge.escapePathName(v)}"
        }.mkString("/")
        val (w, _) = writers.getOrElseUpdate(leaf, {
          val file = s"$staging/e${epochId}_$partitionId/$leaf/" +
            f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID()
              .toString.take(8)}$ext"
          values(leaf) = spec.join(raw)
          (owf.newInstance(file, physSchema, ctx), file)
        })
        val out = dataProj(row)
        val (mins, maxs) = bounds.getOrElseUpdate(leaf,
          (Array.fill[Any](statsFields.size)(null),
            Array.fill[Any](statsFields.size)(null)))
        var j = 0
        while (j < statsFields.size) {
          val (i, dt) = statsFields(j)
          if (!out.isNullAt(i)) {
            val v0 = out.get(i, dt)
            val nan = v0 match {
              case d: java.lang.Double => d.isNaN
              case f: java.lang.Float => f.isNaN
              case _ => false
            }
            if (!nan) {
              // clone strings OFF the projection's reused buffer
              val v = v0 match {
                case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
                case x => x
              }
              if (mins(j) == null || ords(j).lt(v, mins(j))) mins(j) = v
              if (maxs(j) == null || ords(j).gt(v, maxs(j))) maxs(j) = v
            }
          }
          j += 1
        }
        w.write(out)
      }

      override def commit(): WriterCommitMessage = {
        writers.values.foreach(_._1.close())
        val fs = new Path(staging).getFileSystem(conf)
        GraftStreamMsg(writers.toSeq.map { case (leaf, (_, file)) =>
          val st = fs.getFileStatus(new Path(file))
          val cells = bounds.get(leaf).map { case (mins, maxs) =>
            statsFields.zipWithIndex.flatMap { case ((i, dt), j) =>
              for {
                lo <- Snapshots.StatCodec.fromCatalyst(dt, mins(j))
                hi <- Snapshots.StatCodec.fromCatalyst(dt, maxs(j))
              } yield physSchema.fields(i).name -> (lo, hi)
            }.toMap
          }.getOrElse(Map.empty[String, (String, String)])
          (values(leaf), st.getPath.toString, st.getLen, cells)
        })
      }

      override def abort(): Unit = {
        val fs = new Path(staging).getFileSystem(conf)
        writers.values.foreach { case (w, file) =>
          try w.close() catch { case _: Throwable => () }
          try fs.delete(new Path(file), false)
          catch { case _: java.io.IOException => () }
        }
      }

      override def close(): Unit = ()
    }
  }
}

private[sources] object GraftStreamWriterFactory {
  /** the types the task-side bounds tracker handles: primitives copy by
    * value and strings clone — no aliasing with the projection's reused
    * row buffer; decimals and nested types are deliberately out */
  def trackable(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.BooleanType |
           org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
}
