package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** The snapshot table format's three invariants (Snapshots.scala):
  * pinned-reader isolation under a concurrent rewrite, carry-by-
  * reference in partition-replace commits, and the loud optimistic-
  * concurrency failure at the manifest rename. */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def tempTable(): String =
    java.nio.file.Files.createTempDirectory("graft_snap_spec").toString

  private def manifestText(dir: String, v: Long): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$dir/_manifests/v$v%08d.txt")), "UTF-8")

  test("a reader pinned at N-1 is unaffected by a concurrent rewrite") {
    val dir = tempTable()
    val v1 = Snapshots.commit(spark, dir,
      Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("part", "x"), "part")
    assert(v1 == 1L)
    // resolve the pinned reader BEFORE the rewrite lands — its plan is
    // built from v1's immutable manifest
    val pinned = Snapshots.read(spark, dir, "part", v1)
    val v2 = Snapshots.commitReplace(spark, dir,
      Seq(("a", 100L)).toDF("part", "x"), "part")
    assert(v2 == 2L)
    // the pinned reader still sees exactly the v1 state
    val got = pinned.select("part", "x").as[(String, Long)].collect().sorted
    assert(got.sameElements(Array(("a", 1L), ("a", 2L), ("b", 10L))), got.toSeq)
    // re-resolving N-1 AFTER the rewrite sees the same bytes too
    val again = Snapshots.read(spark, dir, "part", v1)
      .select("part", "x").as[(String, Long)].collect().sorted
    assert(again.sameElements(got))
    // and latest is the rewritten state with the untouched partition intact
    val latest = Snapshots.read(spark, dir, "part")
      .select("part", "x").as[(String, Long)].collect().sorted
    assert(latest.sameElements(Array(("a", 100L), ("b", 10L))), latest.toSeq)
  }

  test("commitReplace carries untouched partitions by reference, not by copy") {
    val dir = tempTable()
    Snapshots.commit(spark, dir,
      Seq(("a", 1L), ("b", 10L)).toDF("part", "x"), "part")
    Snapshots.commitReplace(spark, dir,
      Seq(("a", 2L)).toDF("part", "x"), "part")
    val m1 = manifestText(dir, 1L)
    val m2 = manifestText(dir, 2L)
    val pathOf = (m: String, part: String) =>
      m.split("\n").find(_.startsWith(part + "\t")).get.split("\t")(1)
    // untouched partition: the SAME immutable data dir in both manifests
    assert(pathOf(m2, "b") == pathOf(m1, "b"), "b must be carried by reference")
    // rewritten partition: a fresh dir under data/v00000002
    assert(pathOf(m2, "a") != pathOf(m1, "a"))
    assert(pathOf(m2, "a").contains("data/v00000002"))
  }

  test("vacuum retires old versions but never a file a kept manifest references") {
    val dir = tempTable()
    Snapshots.commit(spark, dir,
      Seq(("a", 1L), ("b", 10L)).toDF("part", "x"), "part")      // v1
    Snapshots.commitReplace(spark, dir,
      Seq(("a", 2L)).toDF("part", "x"), "part")                  // v2: b carried from v1
    Snapshots.commitReplace(spark, dir,
      Seq(("a", 3L)).toDF("part", "x"), "part")                  // v3: b still v1's dir
    val dropped = Snapshots.vacuum(spark, dir, keepLast = 2)     // drop v1
    assert(dropped == Seq(1L), dropped)
    // v1 is gone: its manifest is deleted and reading it fails loudly
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, dir, "part", 1L).collect()
    }
    // v1's REPLACED partition dir (a) is unreachable and deleted...
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/data/v00000001/part=a")))
    // ...but v1's b dir is still referenced by the KEPT v2/v3 manifests
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/data/v00000001/part=b")))
    // both kept versions read complete and correct after the vacuum
    val v2 = Snapshots.read(spark, dir, "part", 2L)
      .select("part", "x").as[(String, Long)].collect().sorted
    assert(v2.sameElements(Array(("a", 2L), ("b", 10L))), v2.toSeq)
    val v3 = Snapshots.read(spark, dir, "part", 3L)
      .select("part", "x").as[(String, Long)].collect().sorted
    assert(v3.sameElements(Array(("a", 3L), ("b", 10L))), v3.toSeq)
    // a SECOND vacuum whose window reaches below the already-retired
    // history must be a no-op, not a read of missing manifests
    assert(Snapshots.vacuum(spark, dir, keepLast = 3) == Seq.empty)
    assert(Snapshots.read(spark, dir, "part", 3L)
      .select("part", "x").as[(String, Long)].collect().sorted
      .sameElements(v3))
  }

  test("the manifest rename is the commit point and refuses to overwrite") {
    val dir = tempTable()
    Snapshots.commit(spark, dir, Seq(("a", 1L)).toDF("part", "x"), "part")
    // the conflict branch of the commit point itself: a winner's
    // manifest landed between the loser's currentVersion read and its
    // rename — the rename must refuse and throw, never clobber
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir, "_manifests/v00000001.txt")
    val before = manifestText(dir, 1L)
    val e = intercept[IllegalStateException] {
      Snapshots.writeManifestAtomic(fs, p, "bogus\t/nowhere")
    }
    assert(e.getMessage.contains("concurrent writer"), e.getMessage)
    // the loser must not have damaged the winner's manifest
    assert(manifestText(dir, 1L) == before)
    // and the data-dir guard is the other loud surface: a commit whose
    // version number collides with an existing data dir fails at the
    // mode("error") write instead of overwriting immutable files
    val clash = java.nio.file.Paths.get(s"$dir/data/v00000002")
    java.nio.file.Files.createDirectories(clash)
    java.nio.file.Files.writeString(clash.resolve("marker"), "winner's files")
    intercept[Exception] {
      Snapshots.commit(spark, dir, Seq(("a", 99L)).toDF("part", "x"), "part")
    }
    assert(java.nio.file.Files.readString(clash.resolve("marker"))
      == "winner's files", "immutable data dir was touched")
    // the table is still fully readable at its last good version
    val latest = Snapshots.read(spark, dir, "part")
      .select("part", "x").as[(String, Long)].collect()
    assert(latest.sameElements(Array(("a", 1L))), latest.toSeq)
  }
}
