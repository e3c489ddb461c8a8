// metadata-cost measurement for the snapshot format's file-grain read
// path — run via: sbt "runMain graft.tools.MetaBench"; numbers recorded
// in BASELINE.md (the long-history / big-manifest bounds section)
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the driver-side costs that bound a 10^4-FILE manifest (200
  * partitions x 50 files — a mid-size production table's live set):
  * manifest parse, plan construction (the cost every query pays), and
  * two executed reads (partition-pruned; partition+bounds-pruned). The
  * fabricated entries all point at one real committed file, so data IO
  * is constant and the deltas isolate METADATA work. */
object MetaBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    import graft.sources.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("graft_metabench").toString
    val seed = (1 to 100).map(i => ("p000", i.toLong))
    Snapshots.commit(spark, dir, {
      import spark.implicits._
      seed.toDF("part", "x")
    }, "part", statsColumns = Seq("x"))
    val m1 = Snapshots.readManifest(spark, dir, 1L)
    val real = m1.entries.head
    // fabricate v2: 200 partitions x 50 files, disjoint per-file x-bounds
    val parts = 200
    val filesPerPart = 50
    val lines = (0 until parts).flatMap { p =>
      (0 until filesPerPart).map { f =>
        val lo = (p * filesPerPart + f) * 100L
        f"p$p%03d\t${real.path}\t${real.bytes}\t2\tx=$lo,${lo + 99}"
      }
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val header = Seq("#schema\t" + m1.schema.get.json,
      "#meta\tts=1 op=commit")
    Snapshots.writeManifestAtomic(fs,
      new org.apache.hadoop.fs.Path(dir, "_manifests/v00000002.txt"),
      (header ++ lines).mkString("\n"))
    def timeMs[A](reps: Int)(body: => A): Double = {
      body // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => body)
      (System.nanoTime() - t0) / 1e6 / reps
    }
    val nEntries = parts * filesPerPart
    val parseMs = timeMs(20)(Snapshots.readManifest(spark, dir, 2L))
    val planMs = timeMs(20)(
      Snapshots.read(spark, dir, "part", 2L).queryExecution.sparkPlan)
    val partPruneMs = timeMs(5)(
      Snapshots.read(spark, dir, "part", 2L)
        .filter(col("part") === "p007").count())
    val boundsPruneMs = timeMs(5)(
      Snapshots.read(spark, dir, "part", 2L)
        .filter(col("part") === "p007" &&
          col("x").between(35100L, 35150L)).count())
    println(f"[metabench] entries=$nEntries parse=$parseMs%.1fms " +
      f"plan=$planMs%.1fms partPrunedCount=$partPruneMs%.1fms " +
      f"partAndBoundsPrunedCount=$boundsPruneMs%.1fms")
    spark.stop()
  }
}
