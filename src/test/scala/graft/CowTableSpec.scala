package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CowTable

/** The copy-on-write merge contract: upserts publish new versions that
  * rewrite only matched files, untouched files carry over by reference,
  * and every old version keeps reading its exact snapshot. */
class CowTableSpec extends AnyFunSuite with SparkTest {

  test("mergeUpsert rewrites only matched files, keeps time travel, appends new keys") {
    import spark.implicits._
    val root = tempDir("cow")
    val base = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    CowTable.init(spark, root, base, "event_id", nFiles = 8)
    assert(CowTable.currentVersion(root) == 1)
    val v1Files = CowTable.manifest(root, 1)
    assert(v1Files.size == 8)

    // updates: overwrite 50 clustered keys, insert 10 brand-new ones
    val updates = ((0L until 50L).map(id => (id, -1L, 999.0)) ++
      (1000000L until 1000010L).map(id => (id, -2L, 111.0)))
      .toDF("event_id", "user_id", "value")
    val v2 = CowTable.mergeUpsert(spark, root, updates, "event_id")
    assert(v2 == 2)

    // merged state: updates win, new keys present, everything else intact
    val got = CowTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val orig = base.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val expect = orig ++
      (0L until 50L).map(id => id -> (-1L, 999.0)) ++
      (1000000L until 1000010L).map(id => id -> (-2L, 111.0))
    assert(got == expect)

    // copy-on-write: some v1 files are reused by reference in v2 (the 50
    // matched keys cluster into a subset of the 8 hash files), and at
    // least one file was rewritten
    val v2Files = CowTable.manifest(root, 2)
    val reused = v1Files.toSet.intersect(v2Files.toSet)
    assert(reused.nonEmpty, "no file carried over — COW not happening")
    assert(v2Files.toSet != v1Files.toSet, "no file rewritten")

    // time travel: version 1 still reads the pre-merge snapshot
    val old = CowTable.readVersion(spark, root, 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(old == orig)

    // a second, insert-only upsert chains correctly
    val more = Seq((2000000L, -3L, 5.0)).toDF("event_id", "user_id", "value")
    assert(CowTable.mergeUpsert(spark, root, more, "event_id") == 3)
    val v3 = CowTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(v3 == expect + (2000000L -> (-3L, 5.0)))
    // insert-only: EVERY v2 file survives into v3
    assert(CowTable.manifest(root, 2).toSet.subsetOf(CowTable.manifest(root, 3).toSet))

    // vacuum to the newest 2 versions: v1 gone, v2/v3 still exact, and
    // only files referenced by a kept manifest remain on disk
    val (droppedV, deletedF) = CowTable.vacuum(root, keepVersions = 2)
    assert(droppedV == 1)
    assert(CowTable.read(spark, root).count() == expect.size + 1)
    assert(CowTable.readVersion(spark, root, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap == expect)
    val onDisk = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/files"))
      .iterator().asScala.map(_.getFileName.toString).toSet
    val referenced = (CowTable.manifest(root, 2) ++ CowTable.manifest(root, 3)).toSet
    assert(onDisk == referenced, "vacuum left orphans or deleted referenced files")
    assert(deletedF >= 1, "the v1-only rewritten files should have been deleted")
    intercept[Exception](CowTable.readVersion(spark, root, 1).collect())
  }
}
