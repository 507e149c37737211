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

  test("compact re-clusters into range-disjoint files; prior versions stay exact") {
    import spark.implicits._
    val root = tempDir("cow_compact")
    val base = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    CowTable.init(spark, root, base, "event_id", nFiles = 8)
    // two upserts whose fresh files overlap the untouched files' ranges
    // (each rewrite re-clusters only merged rows — the decay compaction
    // is for)
    CowTable.mergeUpsert(spark, root,
      Seq((3L, -1L, 1.0), (5000L, -1L, 2.0)).toDF("event_id", "user_id", "value"),
      "event_id")
    CowTable.mergeUpsert(spark, root,
      Seq((7L, -2L, 3.0), (7000L, -2L, 4.0)).toDF("event_id", "user_id", "value"),
      "event_id")
    def fileRanges(version: Int): Seq[(String, Long, Long)] =
      CowTable.manifest(root, version).map { n =>
        val r = spark.read.parquet(s"$root/files/$n")
          .agg(min("event_id"), max("event_id")).head()
        (n, r.getLong(0), r.getLong(1))
      }
    def overlaps(rs: Seq[(String, Long, Long)]): Int =
      rs.combinations(2).count { case Seq((_, a1, a2), (_, b1, b2)) =>
        a1 <= b2 && b1 <= a2 }
    val preVersion = CowTable.currentVersion(root)
    val preSnapshot = CowTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(overlaps(fileRanges(preVersion)) > 0,
      "upserts should have produced overlapping key ranges — vacuous otherwise")
    assert(CowTable.manifest(root, preVersion).size > 4)

    val v = CowTable.compact(spark, root, "event_id", nFiles = 4)
    assert(v == preVersion + 1)
    val meta = CowTable.versionMeta(root, v)
    assert(meta - "schema"
      == Map("compaction" -> "true", "key" -> "event_id", "keytype" -> "bigint"))
    assert(java.net.URLDecoder.decode(meta("schema"), "UTF-8")
      == CowTable.read(spark, root).schema.toDDL)
    // fewer files, range-disjoint again, same rows
    val post = fileRanges(v)
    assert(post.size == 4, s"expected 4 compacted files, got ${post.size}")
    assert(overlaps(post) == 0, s"compacted ranges still overlap: $post")
    val got = CowTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == preSnapshot, "compaction changed the table contents")
    // every prior version still reads exactly (files are immutable)
    assert(CowTable.readVersion(spark, root, preVersion).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap == preSnapshot)
    assert(CowTable.readVersion(spark, root, 1).count() == base.count())
    // vacuum after compaction deletes the superseded pre-compact files
    val (_, deleted) = CowTable.vacuum(root, keepVersions = 1)
    assert(deleted > 0)
    val onDisk = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/files"))
      .iterator().asScala.map(_.getFileName.toString).toSet
    assert(onDisk == CowTable.manifest(root, v).toSet)
  }

  test("compactIfNeeded fires only past the overlap threshold and is then idempotent") {
    import spark.implicits._
    val root = tempDir("cow_policy")
    val base = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    CowTable.init(spark, root, base, "event_id", nFiles = 8)
    // fresh range-clustered layout: zero overlapping pairs, policy no-ops
    val (n0, o0) = CowTable.overlapStats(spark, root, "event_id")
    assert(n0 == 8 && o0 == 0, s"fresh layout should be disjoint, got ($n0, $o0)")
    assert(CowTable.compactIfNeeded(spark, root, "event_id", nFiles = 8).isEmpty)
    // upserts spanning DISTANT files: each merge re-clusters the union
    // of the touched files' survivors into 2 fresh ranges that straddle
    // untouched files in between — the decay mechanism itself
    for ((a, b) <- Seq((5L, 9000L), (1500L, 7000L)))
      CowTable.mergeUpsert(spark, root,
        Seq((a, -1L, 1.0), (b, -1L, 2.0)).toDF("event_id", "user_id", "value"),
        "event_id")
    val (n1, o1) = CowTable.overlapStats(spark, root, "event_id")
    assert(o1 > 0, "upserts should have produced overlapping ranges")
    val before = CowTable.currentVersion(root)
    val compacted = CowTable.compactIfNeeded(spark, root, "event_id", nFiles = 8)
    assert(compacted.contains(before + 1), s"policy should have compacted: ($n1, $o1)")
    // restored layout: disjoint again, second call no-ops
    val (n2, o2) = CowTable.overlapStats(spark, root, "event_id")
    assert(n2 == 8 && o2 == 0, s"post-compact layout not disjoint: ($n2, $o2)")
    assert(CowTable.compactIfNeeded(spark, root, "event_id", nFiles = 8).isEmpty)
    assert(CowTable.currentVersion(root) == before + 1)
  }

  test("streaming cdc commits into the cow table exactly once under batch replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tempDir("cow_cdc")
    val evs = graft.model.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val all = evs.as[graft.streaming.ConsumerPipeline.RawEvent].collect().toSeq
    val (w1, w2) = all.splitAt(all.length / 2)

    // end-to-end wiring: two micro-batches through the real stream
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      graft.streaming.ConsumerPipeline.RawEvent]
    val q = graft.streaming.StreamingCdc.startToCow(
      stream.toDF(), root, tempDir("cow_cdc_ckpt"))
    try {
      stream.addData(w1: _*); q.processAllAvailable()
      stream.addData(w2: _*); q.processAllAvailable()
    } finally q.stop()
    val vAfter = CowTable.currentVersion(root)
    assert(vAfter == 2, s"expected one table version per batch, got $vAfter")
    assert(CowTable.appliedBatches(root) == Set(0L, 1L))
    val snapshot = CowTable.read(spark, root).collect()
      .map(r => r.toString).sorted.toSeq

    // at-least-once replay: re-applying either batch id is a NO-OP
    // (this calls the exact foreachBatch body the stream runs)
    graft.streaming.StreamingCdc.applyCdcBatch(root, w1.toDF(), 0L)
    graft.streaming.StreamingCdc.applyCdcBatch(root, w2.toDF(), 1L)
    assert(CowTable.currentVersion(root) == vAfter, "replayed batch published a version")
    assert(CowTable.read(spark, root).collect()
      .map(r => r.toString).sorted.toSeq == snapshot)

    // the table state equals the streaming state semantics: latest
    // change per key (delete markers included) — verify against a batch
    // recomputation over the full event set
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val expect = evs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id").as("key"), col("ts"), col("event_id"),
        when(col("event_type") === "error", lit("delete"))
          .otherwise(lit("upsert")).as("op"),
        round(col("value"), 6).as("new_value"))
      .collect().map(_.toString).sorted.toSeq
    assert(snapshot == expect, "cow table diverged from latest-wins CDC semantics")

    // time travel stays exact across the stream: version 1 is batch 0 alone
    val v1 = CowTable.readVersion(spark, root, 1).collect().map(_.toString).sorted.toSeq
    val b0 = {
      val d = w1.toDF()
      d.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id").as("key"), col("ts"), col("event_id"),
          when(col("event_type") === "error", lit("delete"))
            .otherwise(lit("upsert")).as("op"),
          round(col("value"), 6).as("new_value"))
        .collect().map(_.toString).sorted.toSeq
    }
    assert(v1 == b0, "version 1 is not exactly batch 0's merge")
  }

  test("manifest file stats skip files: a point read opens one file and stays exact") {
    import spark.implicits._
    val root = tempDir("cow_skip")
    val base = (0L until 10000L).map(id => (id, id * 3)).toDF("k", "v")
    CowTable.init(spark, root, base, "k", nFiles = 8)
    // every file entry carries its recorded key range
    val ranges = CowTable.fileRanges(root, 1)
    assert(ranges.size == 8, s"expected stats on all 8 entries, got $ranges")
    // point lookup on the range-clustered layout: exactly ONE file opened
    val point = CowTable.readRange(spark, root, "4242", "4242")
    assert(point.inputFiles.length == 1,
      s"file skipping failed: opened ${point.inputFiles.length} files")
    assert(point.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((4242L, 12726L)))
    // a band read equals the unpruned filtered read, with fewer files
    val band = CowTable.readRange(spark, root, "1000", "3000")
    assert(band.inputFiles.length < 8)
    assert(band.collect().map(_.getLong(0)).sorted.toSeq == (1000L to 3000L))
    // out-of-range read opens nothing and returns nothing
    val none = CowTable.readRange(spark, root, "999999", "9999999")
    assert(none.collect().isEmpty)
    // after an upsert, carried-over entries keep their stats and new
    // files get theirs — pruned reads stay exact across versions
    CowTable.mergeUpsert(spark, root,
      Seq((4242L, -1L), (20000L, -2L)).toDF("k", "v"), "k")
    assert(CowTable.fileRanges(root, 2).size == CowTable.manifest(root, 2).size)
    val after = CowTable.readRange(spark, root, "4242", "4242")
    assert(after.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((4242L, -1L)))
    // legacy manifests (no stats) are never pruned: rewrite v2's
    // manifest with bare names — readRange must fall back to all files
    // and still answer exactly
    val legacy = CowTable.manifest(root, 2)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/manifest/v2.list"),
      (Seq("#key:k") ++ legacy).mkString("\n").getBytes("UTF-8"))
    val fallback = CowTable.readRange(spark, root, "4242", "4242")
    assert(fallback.inputFiles.length == legacy.size)
    assert(fallback.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((4242L, -1L)))
  }

  test("shredded table: typed probes match the string path; lifecycle keeps it shredded; pruning intact") {
    import spark.implicits._
    import org.apache.spark.sql.types.VariantType
    val root = tempDir("cow_shred")
    val base = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("props"))
    CowTable.initShredded(spark, root, base, "event_id", nFiles = 4,
      jsonCols = Seq("props"))

    // the snapshot reads back VARIANT, and the typed probe agrees
    // value-for-value with the string-path probe over the source
    val t1 = CowTable.read(spark, root)
    assert(t1.schema("props").dataType == VariantType)
    def probed(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"),
        try_variant_get(col("props"), "$.k", "int").as("k"),
        try_variant_get(col("props"), "$.missing", "string").as("absent"))
      .orderBy("event_id").collect().map(_.toString).toSeq
    val expect = base
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        get_json_object(col("props"), "$.missing").as("absent"))
      .orderBy("event_id").collect().map(_.toString).toSeq
    assert(probed(t1) == expect, "shredded probe diverged from string path")
    // the write-time parse is GONE from the read plan
    val plan = t1.select(try_variant_get(col("props"), "$.k", "int"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("parse_json"), s"shredded read still parses:\n$plan")
    // (conf isolation is by construction — the shredding confs are set
    // only on bindShredWriteSession's clone; they also happen to default
    // true in this Spark version, so getOption can't probe for a leak)

    // manifest pruning works exactly as on a string table: stats on
    // every entry, point read opens one file
    assert(CowTable.fileRanges(root, 1).size == 4)
    val point = CowTable.readRange(spark, root, "42", "42")
    assert(point.inputFiles.length == 1)
    assert(point.select(try_variant_get(col("props"), "$.k", "int")).count() == 1)

    // upsert with STRING props: parsed at write, table stays shredded
    val newId = 900000000L
    val updates = Seq((0L, "upd", """{"k": 7, "s": "x"}"""),
      (newId, "new", """{"k": 8}"""))
      .toDF("event_id", "event_type", "props")
    assert(CowTable.mergeUpsert(spark, root, updates, "event_id") == 2)
    val t2 = CowTable.read(spark, root)
    assert(t2.schema("props").dataType == VariantType)
    assert(t2.filter(col("event_id") === 0L)
      .select(try_variant_get(col("props"), "$.k", "int")).head().getInt(0) == 7)
    assert(t2.filter(col("event_id") === newId)
      .select(try_variant_get(col("props"), "$.k", "int")).head().getInt(0) == 8)
    assert(t2.count() == base.count() + 1)
    // time travel: v1 still answers the PRE-upsert probe
    assert(probed(CowTable.readVersion(spark, root, 1)) == expect)

    // compact and deleteRange both keep the table shredded
    assert(CowTable.compact(spark, root, "event_id", 2) == 3)
    val t3 = CowTable.read(spark, root)
    assert(t3.schema("props").dataType == VariantType)
    assert(t3.filter(col("event_id") === 0L)
      .select(try_variant_get(col("props"), "$.k", "int")).head().getInt(0) == 7)
    CowTable.deleteRange(spark, root, newId.toString, newId.toString)
    val t4 = CowTable.read(spark, root)
    assert(t4.schema("props").dataType == VariantType)
    assert(t4.count() == base.count())
    assert(t4.filter(col("event_id") === newId).count() == 0)
  }

  test("streaming cdc is latest-wins when a NEWER record arrived in an EARLIER batch") {
    import spark.implicits._
    import graft.streaming.ConsumerPipeline.RawEvent
    def ev(id: Long, tsSec: Long, user: Long, v: Double) =
      RawEvent(id, new java.sql.Timestamp(tsSec * 1000L), user, "click", v, "{}")
    val root = tempDir("cow_ooo")
    // batch 0 carries user 1's NEWEST record (ts=200) and user 2's oldest;
    // batch 1 carries an OLDER record for user 1 (ts=100 — must NOT win),
    // a newer one for user 2, and a brand-new user 3
    graft.streaming.StreamingCdc.applyCdcBatch(root,
      Seq(ev(10L, 200L, 1L, 1.0), ev(11L, 50L, 2L, 2.0)).toDF(), 0L)
    graft.streaming.StreamingCdc.applyCdcBatch(root,
      Seq(ev(20L, 100L, 1L, 9.0), ev(21L, 60L, 2L, 3.0), ev(22L, 10L, 3L, 4.0))
        .toDF(), 1L)
    val got = CowTable.read(spark, root).collect()
      .map(r => r.getAs[Long]("key") ->
        (r.getAs[Long]("event_id"), r.getAs[Double]("new_value"))).toMap
    // user 1 keeps batch 0's ts=200 record despite batch 1's later arrival
    assert(got == Map(1L -> (10L, 1.0), 2L -> (21L, 3.0), 3L -> (22L, 4.0)),
      s"cow table is not latest-wins by (ts, event_id): $got")
    // same-ts tie breaks by event_id, also across batches
    graft.streaming.StreamingCdc.applyCdcBatch(root,
      Seq(ev(5L, 200L, 1L, 7.0)).toDF(), 2L) // lower event_id at equal ts: loses
    graft.streaming.StreamingCdc.applyCdcBatch(root,
      Seq(ev(30L, 200L, 1L, 8.0)).toDF(), 3L) // higher event_id at equal ts: wins
    val u1 = CowTable.read(spark, root).filter(col("key") === 1L)
      .select("event_id", "new_value").head()
    assert((u1.getLong(0), u1.getDouble(1)) == (30L, 8.0))
    // the batch metas all committed (losing batches still publish their id)
    assert(CowTable.appliedBatches(root) == Set(0L, 1L, 2L, 3L))
    assert(CowTable.latestAppliedBatch(root).contains(3L))
  }

  test("optimistic concurrency: interleaved mergeUpserts both land, loser leaves no orphans") {
    import spark.implicits._
    val root = tempDir("cow_occ")
    val base = (0L until 1000L).map(id => (id, 0L)).toDF("k", "v")
    CowTable.init(spark, root, base, "k", nFiles = 4)
    val aUpd = (500L until 510L).map(id => (id, -1L)).toDF("k", "v")
    val bUpd = (10L until 20L).map(id => (id, -2L)).toDF("k", "v")
    // deterministic race: writer B commits v2 BETWEEN writer A's diff
    // (against v1) and A's commit attempt — A must lose the CAS, delete
    // its staged files, re-diff against B's snapshot, and land as v3
    var bVersion = -1
    val aVersion = CowTable.mergeUpsertRetrying(spark, root, aUpd, "k", 2,
      Map.empty, attempt =>
        if (attempt == 1) bVersion = CowTable.mergeUpsert(spark, root, bUpd, "k"))
    assert(bVersion == 2, "the injected competing writer should commit v2")
    assert(aVersion == 3, s"loser must retry and land as v3, got $aVersion")
    assert(CowTable.currentVersion(root) == 3)
    // BOTH writers' rows are in the final snapshot, no duplicates
    val fin = CowTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fin.size == 1000)
    assert((10L until 20L).forall(fin(_) == -2L), "B's rows lost in the retry")
    assert((500L until 510L).forall(fin(_) == -1L), "A's rows lost in the retry")
    // time travel: v2 is B's snapshot — B's rows applied, A's not yet
    val v2 = CowTable.readVersion(spark, root, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v2(10L) == -2L && v2(500L) == 0L)
    // the losing attempt's data files were reclaimed: every file on
    // disk is referenced by some manifest (nothing for vacuum but history)
    val referenced = (1 to 3).flatMap(v => CowTable.manifest(root, v)).toSet
    val onDisk = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/files"))
      .iterator().asScala.map(_.getFileName.toString).toSet
    assert(onDisk == referenced,
      s"orphans after losing a race: ${onDisk.diff(referenced)}")
    // vacuum to newest only: final snapshot still exact
    CowTable.vacuum(root, keepVersions = 1)
    val post = CowTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(post == fin)
  }

  test("readRange prunes and classifies from manifest metadata alone — zero footers") {
    import spark.implicits._
    val root = tempDir("cow_nofooter")
    val base = (0L until 10000L).map(id => (id, id * 3)).toDF("k", "v")
    CowTable.init(spark, root, base, "k", nFiles = 8)
    assert(CowTable.versionMeta(root, 1).get("keytype").contains("bigint"))
    // corrupt every data file EXCEPT the one whose range holds 4242: if
    // the point read opened ANY other file — for schema sniffing or
    // otherwise — parquet reading would throw on the garbage bytes
    val keeper = CowTable.fileRanges(root, 1)
      .find(e => e._2.toLong <= 4242L && 4242L <= e._3.toLong).get._1
    CowTable.manifest(root, 1).filterNot(_ == keeper).foreach { n =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/files/$n"),
        "not a parquet file".getBytes("UTF-8"))
    }
    val point = CowTable.readRange(spark, root, "4242", "4242")
    assert(point.inputFiles.length == 1)
    assert(point.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((4242L, 12726L)))
  }

  test("string-key pruning compares UTF-8 bytes, not UTF-16 (supplementary chars)") {
    import spark.implicits._
    val root = tempDir("cow_utf8")
    val supp = new String(Character.toChars(0x10000)) // beyond the BMP
    val keys = Seq("a", "￿", supp)
    CowTable.init(spark, root, keys.map(k => (k, 1L)).toDF("k", "v"),
      "k", nFiles = 1)
    // Spark's recorded max is the UTF-8-binary max (the supplementary
    // char); a Java-String compare would call "￿" > max and prune
    // the file, silently dropping the row (round-13 ADVICE)
    val got = CowTable.readRange(spark, root, "￿", "￿").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("￿"),
      "UTF-16 bound compare wrongly pruned the file holding U+FFFF")
    // and the full range read still equals the unpruned filter
    val all = CowTable.readRange(spark, root, "a", supp).collect()
    assert(all.map(_.getString(0)).sorted.toSeq == keys.sorted)
  }

  test("empty manifests read as empty frames; malformed numeric bounds fail clearly") {
    import spark.implicits._
    val root = tempDir("cow_guards")
    CowTable.init(spark, root,
      (0L until 10L).map(id => (id, id)).toDF("k", "v"), "k", nFiles = 2)
    // malformed bound against a numeric key: a clear error, not a
    // NumberFormatException from deep inside BigDecimal
    val ex = intercept[IllegalArgumentException] {
      CowTable.readRange(spark, root, "abc", "zzz")
    }
    assert(ex.getMessage.contains("not numeric"))
    // a hand-written version with ZERO files: empty frame of the key
    // column (the only schema the manifest vouches for), no throw
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/manifest/v2.list"),
      "#key:k\n#keytype:bigint".getBytes("UTF-8"))
    val empty = CowTable.readRange(spark, root, "0", "9")
    assert(empty.schema.fieldNames.toSeq == Seq("k"))
    assert(empty.collect().isEmpty)
  }

  test("schema evolution: an add-column upsert widens the table; old versions keep their schema") {
    import spark.implicits._
    val root = tempDir("cow_evo")
    CowTable.init(spark, root,
      (0L until 100L).map(id => (id, id * 2)).toDF("k", "v"), "k", nFiles = 4)
    // upsert carries a NEW column `tag`: matched keys rewritten with it,
    // new keys appended with it, untouched files stay narrow on disk
    val updates = Seq((10L, -1L, "hot"), (500L, -2L, "new")).toDF("k", "v", "tag")
    val v2 = CowTable.mergeUpsert(spark, root, updates, "k")
    assert(v2 == 2)
    val cur = CowTable.read(spark, root)
    assert(cur.schema.fieldNames.toSet == Set("k", "v", "tag"))
    val byK = cur.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.getString(2)))).toMap
    assert(byK.size == 101)
    assert(byK(10L) == ((-1L, Some("hot"))))
    assert(byK(500L) == ((-2L, Some("new"))))
    // survivors and untouched rows read the new column as null
    assert(byK(11L)._2.isEmpty && byK(99L)._2.isEmpty)
    // time travel: v1 still reads its ORIGINAL 2-column schema
    assert(CowTable.readVersion(spark, root, 1).schema.fieldNames.toSet
      == Set("k", "v"))
    // pruned range reads work across the mixed-schema snapshot
    val pt = CowTable.readRange(spark, root, "10", "10").collect()
    assert(pt.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((10L, -1L)))
    // compaction unifies every file to the union schema
    CowTable.compact(spark, root, "k", nFiles = 2)
    val post = CowTable.read(spark, root)
    assert(post.schema.fieldNames.toSet == Set("k", "v", "tag"))
    assert(post.count() == 101)
  }

  test("schema comes from the manifest, not parquet footers — and survives narrow-file upserts") {
    import spark.implicits._
    val root = tempDir("cow_schemahdr")
    CowTable.init(spark, root,
      (0L until 100L).map(id => (id, id * 2)).toDF("k", "v"), "k", nFiles = 4)
    // every commit records the snapshot DDL
    val ddl1 = java.net.URLDecoder.decode(
      CowTable.versionMeta(root, 1)("schema"), "UTF-8")
    assert(ddl1 == Seq((0L, 0L)).toDF("k", "v").schema.toDDL)
    // v2 widens via one touched file; v3 then touches ONLY a still-narrow
    // file with 2-column updates — the recorded v3 schema must keep `tag`
    // (deriving it from the touched files' union would drop it)
    CowTable.mergeUpsert(spark, root,
      Seq((10L, -1L, "hot")).toDF("k", "v", "tag"), "k")
    CowTable.mergeUpsert(spark, root, Seq((90L, -9L)).toDF("k", "v"), "k")
    val v3 = CowTable.read(spark, root)
    assert(v3.schema.fieldNames.toSeq == Seq("k", "v", "tag"))
    val byK = v3.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.getString(2)))).toMap
    assert(byK(10L) == ((-1L, Some("hot"))))
    assert(byK(90L) == ((-9L, None)))
    // footer-blindness: replace EVERY data file with garbage — the
    // recorded header still answers schema questions for every version
    // (the legacy mergeSchema path would have to open footers and throw)
    CowTable.manifest(root, 3).foreach { n =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/files/$n"),
        "not a parquet file".getBytes("UTF-8"))
    }
    assert(CowTable.readVersion(spark, root, 1).schema.fieldNames.toSeq
      == Seq("k", "v"))
    assert(CowTable.readVersion(spark, root, 3).schema.fieldNames.toSeq
      == Seq("k", "v", "tag"))
  }

  test("deleteRange drops covered files manifest-only, rewrites boundaries, keeps history") {
    import spark.implicits._
    val root = tempDir("cow_delete")
    val base = (0L until 10000L).map(id => (id, id * 3)).toDF("k", "v")
    CowTable.init(spark, root, base, "k", nFiles = 8)
    val before = CowTable.manifest(root, 1)
    val ranges = CowTable.fileRanges(root, 1)
      .map(e => e._1 -> (e._2.toLong, e._3.toLong)).toMap
    val v2 = CowTable.deleteRange(spark, root, "2000", "4999")
    assert(v2 == 2)
    // exactness: v2 equals the filtered snapshot
    val got = CowTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 7000)
    assert(got.keySet.forall(k => k < 2000 || k > 4999))
    assert(got(1999L) == 5997L && got(5000L) == 15000L)
    // classification: disjoint files carried BY NAME; fully-covered
    // files gone from the manifest; only boundary files rewritten
    val after = CowTable.manifest(root, 2).toSet
    before.foreach { n =>
      val (mn, mx) = ranges(n)
      if (mx < 2000 || mn > 4999) assert(after.contains(n), s"disjoint $n not carried")
      else if (mn >= 2000 && mx <= 4999) {
        assert(!after.contains(n), s"covered $n not dropped")
        // metadata-only: the dropped file's bytes are still on disk for v1
        assert(java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$root/files/$n")))
      } else assert(!after.contains(n), s"boundary $n not rewritten")
    }
    // time travel: v1 still reads all 10000 rows
    assert(CowTable.readVersion(spark, root, 1).count() == 10000)
    // pruned point reads still exact on both sides of the hole
    assert(CowTable.readRange(spark, root, "3000", "3000").collect().isEmpty)
    assert(CowTable.readRange(spark, root, "5000", "5000")
      .collect().map(_.getLong(1)).toSeq == Seq(15000L))
    // delete header recorded; schema header carried
    val m = CowTable.versionMeta(root, 2)
    assert(m("delete") == "[2000,4999]" && m.contains("schema"))
    assert(CowTable.deleteBounds(root, 2).contains(("2000", "4999")))
    assert(CowTable.deleteBounds(root, 1).isEmpty)
    // vacuum with history dropped reclaims the dead files
    val (droppedVers, removedFiles) = CowTable.vacuum(root, keepVersions = 1)
    assert(droppedVers == 1 && removedFiles > 0)
    assert(CowTable.read(spark, root).count() == 7000)
  }

  test("deleteRange bounds with newline/comma survive the manifest round-trip (URL-encoded)") {
    import spark.implicits._
    // round-13 ADVICE: raw bounds in the #delete header let a newline
    // corrupt the line-oriented manifest and a comma break the [lo,hi]
    // parse — bounds now travel URL-encoded like file-entry stats
    val root = tempDir("cow_delete_enc")
    val base = Seq("apple", "banana", "cherry", "grape", "mango", "peach")
      .map(k => (k, k.length)).toDF("k", "v")
    CowTable.init(spark, root, base, "k", nFiles = 3)
    val (lo, hi) = ("b\n", "g,zz") // lex window covering banana, cherry
    val v2 = CowTable.deleteRange(spark, root, lo, hi)
    assert(v2 == 2)
    // the manifest stayed parseable: version meta reads, bounds decode
    assert(CowTable.deleteBounds(root, 2).contains((lo, hi)))
    assert(CowTable.versionMeta(root, 2).contains("schema"))
    assert(CowTable.read(spark, root).select("k").collect()
      .map(_.getString(0)).sorted.toSeq
      == Seq("apple", "grape", "mango", "peach"))
    assert(CowTable.readVersion(spark, root, 1).count() == 6)
  }

  test("chaos: writer killed inside the publish window — no torn version, retry lands, vacuum exact") {
    import spark.implicits._
    import java.nio.file.{Files => JF, Paths => JP, StandardOpenOption => SO}
    val root = tempDir("cow_chaos")
    val base = (0L until 1000L).map(id => (id, id % 7, id * 1.0))
      .toDF("event_id", "user_id", "value")
    CowTable.init(spark, root, base, "event_id", nFiles = 4)

    // ---- kill window A: writer dies AFTER staging data files, BEFORE
    // the CAS — on-disk state: orphan parquet in files/, no manifest.
    // Simulated by planting unreferenced files (what a dead mergeAttempt
    // leaves, since its cleanup never ran).
    val orphanA = JP.get(s"$root/files/deadwriter-attempt1.parquet")
    JF.write(orphanA, Array.fill(128)(0x5a.toByte))
    // a reader racing the crash sees the OLD version, bit-exact
    assert(CowTable.currentVersion(root) == 1)
    assert(CowTable.read(spark, root).count() == 1000L)

    // the restarted writer retries the same logical update and lands
    val upd = Seq((1L, -1L, 999.0), (5000L, -2L, 111.0))
      .toDF("event_id", "user_id", "value")
    assert(CowTable.mergeUpsert(spark, root, upd, "event_id") == 2)

    // ---- kill window B: writer dies BETWEEN the hard-link CAS and its
    // tmp-delete/dir-fsync — on-disk state: v3.list PUBLISHED with fully
    // forced bytes, the staging tmp still present. Replayed file-op by
    // file-op exactly as tryCommitManifest performs them.
    // carry v2 wholesale: raw manifest lines, headers AND stats intact
    val body = CowTable.manifestLines(root, 2).mkString("\n")
    val tmpB = JP.get(s"$root/manifest/.v3-deadbeef.tmp")
    val ch = java.nio.channels.FileChannel.open(tmpB, SO.CREATE, SO.WRITE)
    ch.write(java.nio.ByteBuffer.wrap(body.getBytes("UTF-8"))); ch.force(true); ch.close()
    JF.createLink(JP.get(s"$root/manifest/v3.list"), tmpB)
    // (crash here: no tmp delete, no dir fsync)

    // no torn version: the racing reader sees v3 COMPLETE — the link
    // published fully-forced bytes, so every manifest line is whole and
    // the snapshot reads exactly (carried v2 = post-upsert rows)
    assert(CowTable.currentVersion(root) == 3)
    val v3got = CowTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(v3got(1L) == ((-1L, 999.0)) && v3got(5000L) == ((-2L, 111.0)))
    assert(v3got.size == 1001)
    CowTable.manifestLines(root, 3).filterNot(_.startsWith("#")).foreach(l =>
      assert(l.split("\\|").length == 3, s"torn manifest line: $l"))

    // the dead writer's RETRY (restarted job, same next-version target)
    // must lose the CAS on v3 — never overwrite it — and land on v4
    val upd2 = Seq((2L, -4L, 7.0)).toDF("event_id", "user_id", "value")
    assert(CowTable.mergeUpsert(spark, root, upd2, "event_id") == 4)
    val v4got = CowTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(v4got(2L) == ((-4L, 7.0)))

    // ---- vacuum reclaims BOTH crash artifacts exactly: the window-A
    // orphan data file and the window-B dead tmp (grace 0 in the test;
    // production default keeps a 1 h grace so a LIVE writer's tmp is
    // never swept between its force and its link), while every kept
    // version still reads
    val (_, reclaimed) = CowTable.vacuum(root, keepVersions = 2, tmpGraceMs = 0L)
    assert(!JF.exists(orphanA), "window-A orphan data file survived vacuum")
    assert(!JF.exists(tmpB), "window-B dead manifest tmp survived vacuum")
    assert(reclaimed >= 2)
    val onDisk = JF.list(JP.get(s"$root/files"))
      .iterator().asScala.map(_.getFileName.toString).toSet
    val referenced = (CowTable.manifest(root, 3) ++ CowTable.manifest(root, 4)).toSet
    assert(onDisk == referenced, "vacuum left orphans or deleted referenced files")
    assert(CowTable.read(spark, root).count() == 1001L)
  }

  test("a reader pinned to an old version survives a concurrent vacuum of newer history") {
    import spark.implicits._
    val root = tempDir("cow_vac")
    val base = (0L until 1000L).map(id => (id, id * 2)).toDF("k", "v")
    CowTable.init(spark, root, base, "k", nFiles = 4)
    CowTable.mergeUpsert(spark, root, Seq((1L, 99L)).toDF("k", "v"), "k")
    CowTable.mergeUpsert(spark, root, Seq((2L, 98L)).toDF("k", "v"), "k")
    // pin a reader to the CURRENT version's concrete file list, then
    // vacuum keeping 2 versions while that plan is live: vacuum must
    // only delete files unreferenced by KEPT manifests, so the pinned
    // version (which is kept) still reads mid-vacuum
    val pinned = CowTable.readVersion(spark, root, 3)
    val t = new Thread(() => CowTable.vacuum(root, keepVersions = 2))
    t.start(); t.join(30000)
    assert(pinned.count() == 1000)
    assert(CowTable.readVersion(spark, root, 2).count() == 1000)
    // v1 history is gone; its superseded files are not
    intercept[Exception](CowTable.readVersion(spark, root, 1).collect())
  }

  test("mergeUpsert resolves same-name type conflicts by lossless widening; rejects lossy ones") {
    import spark.implicits._
    val root = tempDir("cow_widen")
    val base = (0L until 100L).map(id => (id, id.toInt))
      .toDF("event_id", "score") // score: INT
    CowTable.init(spark, root, base, "event_id", nFiles = 4)
    assert(CowTable.read(spark, root).schema("score").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // updates carry score as LONG with values beyond int range: the
    // snapshot must WIDEN (files and #schema header agree — an explicit
    // narrow-schema read over widened parquet would fail)
    val updates = Seq((5L, 10000000000L), (200L, 20000000000L))
      .toDF("event_id", "score")
    val v2 = CowTable.mergeUpsert(spark, root, updates, "event_id")
    val snap = CowTable.readVersion(spark, root, v2)
    assert(snap.schema("score").dataType ==
      org.apache.spark.sql.types.LongType, "type not widened")
    val got = snap.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) == 10000000000L && got(200L) == 20000000000L)
    assert(got(6L) == 6L, "survivor row lost its value in the widening")
    assert(got.size == 101)
    // time travel: v1 still reads INT
    assert(CowTable.readVersion(spark, root, 1).schema("score").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // a narrower follow-up merge (int updates into the widened table)
    // keeps the WIDE type — the keytype/schema header must not regress
    val narrow = Seq((7L, 77)).toDF("event_id", "score")
      .select(col("event_id"), col("score").cast("int").as("score"))
    val v3 = CowTable.mergeUpsert(spark, root, narrow, "event_id")
    assert(CowTable.readVersion(spark, root, v3).schema("score").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(CowTable.read(spark, root).filter(col("event_id") === 7L)
      .head().getLong(1) == 77L)
    // LOSSY conflict (string vs long) fails loudly BEFORE writing and
    // publishes nothing
    val before = CowTable.currentVersion(root)
    val bad = Seq((8L, "oops")).toDF("event_id", "score")
    val e = intercept[RuntimeException](
      CowTable.mergeUpsert(spark, root, bad, "event_id"))
    assert(e.getMessage.contains("schema conflict on column 'score'"))
    assert(CowTable.currentVersion(root) == before, "failed merge published a version")
  }
}
