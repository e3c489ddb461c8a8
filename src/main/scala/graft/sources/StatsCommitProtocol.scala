package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage
import org.apache.spark.internal.io.FileNameSpec
import org.apache.spark.sql.execution.datasources.SQLHadoopMapReduceCommitProtocol
import org.apache.spark.sql.types.DataType

/** A [[SQLHadoopMapReduceCommitProtocol]] that collects per-file
  * [min, max] column bounds IN THE WRITER TASKS and ships them to the
  * driver inside the task commit messages — the way Delta/Iceberg record
  * file statistics, and the closer of the write path's last O(files)
  * driver term: without it the commit reads every written file's parquet
  * footer from a bounded DRIVER pool ([[Snapshots.collectStats]]), which
  * at a 10^4-file commit on an object store is ~10^4 sequential-ish
  * opens from one node. Here each task reads the footers of the files IT
  * just wrote (local, page-cache-warm, embarrassingly parallel across
  * the cluster) right before its task commit, and the driver only folds
  * the per-task maps — O(tasks) message payloads, zero driver footer IO.
  *
  * Mechanics: [[Snapshots]] registers the wanted (physical column ->
  * type) map under the write's output path before the write starts; the
  * driver-side constructor (reflective, via
  * `spark.sql.sources.commitProtocolClass`) picks it up and the field
  * serializes into the tasks. For any output path with NO registration
  * the class is behaviorally identical to its parent — which is why the
  * session conf can stay set globally instead of being toggled around
  * each write (toggling would race concurrent committers).
  *
  * Footer reads happen BEFORE `super.commitTask` moves the task attempt
  * dir, while the recorded temp paths still exist; only the COMMITTED
  * tasks' messages reach `commitJob`, so a speculative twin's stats are
  * dropped with its files. Stats are keyed by the file's path RELATIVE
  * to the job output dir (partition dir + basename, both preserved by
  * the commit rename), which the commit path re-qualifies against its
  * own listing. A failed footer read degrades that one file to
  * "no bounds" — file skipping stays conservative, never a correctness
  * input — and [[Snapshots]] backfills any missing file from the driver
  * pool (normally zero). */
final class StatsCommitProtocol(jobId: String, path: String,
    dynamicPartitionOverwrite: Boolean)
    extends SQLHadoopMapReduceCommitProtocol(
      jobId, path, dynamicPartitionOverwrite) {

  /** wanted physical-column bounds for THIS write, resolved at
    * driver-side construction from the registry; empty = pass-through */
  private val wanted: Map[String, DataType] =
    StatsCommitProtocol.pending.getOrDefault(
      StatsCommitProtocol.normKey(path), Map.empty)

  /** (relative path under the output dir, temp path) per file this TASK
    * opened — task-side state, rebuilt by setupTask after deserialization */
  @transient private var taskFiles: ArrayBuffer[(String, String)] = _

  override def setupTask(taskContext: TaskAttemptContext): Unit = {
    super.setupTask(taskContext)
    taskFiles = ArrayBuffer.empty
  }

  override def newTaskTempFile(taskContext: TaskAttemptContext,
      dir: Option[String], spec: FileNameSpec): String = {
    val tmp = super.newTaskTempFile(taskContext, dir, spec)
    if (wanted.nonEmpty) {
      val name = new org.apache.hadoop.fs.Path(tmp).getName
      taskFiles += ((dir.map(_ + "/").getOrElse("") + name, tmp))
    }
    tmp
  }

  override def commitTask(
      taskContext: TaskAttemptContext): TaskCommitMessage = {
    if (wanted.isEmpty) return super.commitTask(taskContext)
    // footers first: super.commitTask moves the task attempt dir out
    // from under the recorded temp paths
    val conf = taskContext.getConfiguration
    val stats: Map[String, Map[String, (String, String)]] =
      taskFiles.iterator.map { case (rel, tmp) =>
        rel -> (try Snapshots.footerBounds(conf,
            new org.apache.hadoop.fs.Path(tmp), wanted)
          catch { case _: Exception => Map.empty[String, (String, String)] })
      }.toMap
    val parent = super.commitTask(taskContext)
    new TaskCommitMessage((parent.obj, stats))
  }

  override def commitJob(jobContext: JobContext,
      taskCommits: Seq[TaskCommitMessage]): Unit = {
    if (wanted.isEmpty) { super.commitJob(jobContext, taskCommits); return }
    val unwrapped = taskCommits.map { m =>
      m.obj match {
        case (parentObj, st) =>
          (new TaskCommitMessage(parentObj),
            st.asInstanceOf[Map[String, Map[String, (String, String)]]])
        case _ => (m, Map.empty[String, Map[String, (String, String)]])
      }
    }
    super.commitJob(jobContext, unwrapped.map(_._1))
    // publish only AFTER the parent commit landed the files — an abort
    // must leave no stats behind for a commit that never happened
    StatsCommitProtocol.results.put(StatsCommitProtocol.normKey(path),
      unwrapped.iterator.map(_._2).foldLeft(
        Map.empty[String, Map[String, (String, String)]])(_ ++ _))
  }
}

object StatsCommitProtocol {
  /** scheme-independent key: the ctor's `path` string and the
    * registrant's dataDir string may differ in qualification */
  private[sources] def normKey(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath.stripSuffix("/")

  /** output path -> wanted (physical column -> type); registered by the
    * committer immediately before the write, consumed by the driver-side
    * constructor. Entries are removed by the committer's `finally` —
    * bounded by in-flight commits. */
  private[sources] val pending =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, DataType]]()

  /** output path -> per-file stats (relative path -> column -> (lo, hi)),
    * published by commitJob, consumed (removed) by the committer. */
  private[sources] val results = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, Map[String, (String, String)]]]()

  /** register/consume pair for one write; consume ALWAYS runs (finally)
    * so an aborted write leaks neither map entry */
  private[sources] def register(dataDir: String,
      wanted: Map[String, DataType]): Unit =
    pending.put(normKey(dataDir), wanted)

  private[sources] def consume(dataDir: String)
      : Option[Map[String, Map[String, (String, String)]]] = {
    val k = normKey(dataDir)
    pending.remove(k)
    Option(results.remove(k))
  }
}
