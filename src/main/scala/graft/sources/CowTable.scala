package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-based copy-on-write table — the MERGE-INTO write path of a
  * lake table (Delta/Iceberg's core move) on plain parquet + a text
  * manifest, with no extra dependencies:
  *
  *  - data lives as immutable files under `<root>/files/`;
  *  - each version is a manifest (`<root>/manifest/v<N>.list`, one file
  *    name per line) listing the files that make up that snapshot;
  *  - [[mergeUpsert]] rewrites ONLY the files that contain a matched
  *    key: untouched files are carried over into the next manifest by
  *    REFERENCE (never copied or rewritten — the copy-on-write win: an
  *    upsert touching 0.1% of keys rewrites ~0.1% of the table);
  *  - every older manifest keeps reading its exact snapshot
  *    ([[readVersion]]) — time travel for free, because data files are
  *    immutable and only manifests accumulate.
  *
  * Scale shape: the only driver-side materialization is the FILE LIST
  * (manifest-sized — metadata, same class as GraphOps' size-gated
  * collects); touched-file discovery is one distributed semi-join of
  * the current snapshot against the update keys, reading only the key
  * column plus file names. Single-writer by contract (the reference
  * engine's store has the same discipline); manifests publish via
  * write-temp-then-atomic-rename so a concurrent READER never sees a
  * torn version.
  */
object CowTable {

  private def filesDir(root: String) = s"$root/files"
  private def manifestDir(root: String) = s"$root/manifest"

  private def listVersions(root: String): Seq[Int] = {
    val d = Paths.get(manifestDir(root))
    if (!Files.isDirectory(d)) Seq.empty
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".list") =>
        s.stripPrefix("v").stripSuffix(".list").toInt }
      .toSeq.sorted
  }

  /** Newest committed version, 0 if the table does not exist yet. */
  def currentVersion(root: String): Int = listVersions(root).lastOption.getOrElse(0)

  /** The file names (relative to `files/`) composing `version`. */
  def manifest(root: String, version: Int): Seq[String] =
    Files.readAllLines(Paths.get(manifestDir(root), s"v$version.list"),
      StandardCharsets.UTF_8).asScala.toSeq.filter(_.nonEmpty)

  private def writeManifest(root: String, version: Int, names: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(manifestDir(root)))
    val tmp = Paths.get(manifestDir(root), s".v$version.tmp")
    Files.write(tmp, names.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(manifestDir(root), s"v$version.list"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Write `df` into `nFiles` fresh immutable files, returning their
    * names: stage through a Spark write, then move each part into
    * `files/` under a unique name (files are immutable, so a plain
    * rename is safe). */
  private def writeFiles(spark: SparkSession, root: String, df: DataFrame,
      nFiles: Int, key: String): Seq[String] = {
    val stage = s"$root/.stage-${java.util.UUID.randomUUID()}"
    // range-clustered on the key, files internally sorted: upserts then
    // touch only the files whose key range they hit (the property the
    // COW reuse depends on), and per-file min/max stay selective
    df.repartitionByRange(math.max(1, nFiles), col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(stage)
    Files.createDirectories(Paths.get(filesDir(root)))
    val parts = Files.list(Paths.get(stage)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    val names = parts.map { p =>
      val name = s"${java.util.UUID.randomUUID()}.parquet"
      Files.move(p, Paths.get(filesDir(root), name))
      name
    }
    Files.list(Paths.get(stage)).iterator().asScala.foreach(Files.delete)
    Files.delete(Paths.get(stage))
    names
  }

  /** Create the table as version 1. */
  def init(spark: SparkSession, root: String, df: DataFrame, key: String,
      nFiles: Int): Int = {
    require(listVersions(root).isEmpty, s"table already exists at $root")
    writeManifest(root, 1, writeFiles(spark, root, df, nFiles, key))
    1
  }

  /** Read a specific snapshot (defaults handled by [[read]]). */
  def readVersion(spark: SparkSession, root: String, version: Int): DataFrame = {
    val paths = manifest(root, version).map(n => s"${filesDir(root)}/$n")
    spark.read.parquet(paths: _*)
  }

  /** Read the newest snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, currentVersion(root))

  /** MERGE INTO: rows of `updates` replace current rows with the same
    * `key` (matched) and append otherwise (not matched) — publishing a
    * new version whose manifest reuses every file no matched key lives
    * in. Keys must be unique in the current snapshot and in `updates`
    * (the upsert contract). Returns the new version number. */
  def mergeUpsert(spark: SparkSession, root: String, updates: DataFrame,
      key: String, nNewFiles: Int = 2): Int = {
    val cur = currentVersion(root)
    require(cur > 0, s"no table at $root")
    val names = manifest(root, cur)
    val touched: Set[String] = {
      val cols = readVersion(spark, root, cur)
        .select(col(key)).withColumn("__file", input_file_name())
      cols.join(updates.select(col(key)), Seq(key), "left_semi")
        .select("__file").distinct()
        .collect().map(_.getString(0)).toSet // file list — metadata-sized
    }
    val touchedNames = names.filter(n => touched.exists(_.endsWith("/" + n)))
    val untouched = names.diff(touchedNames)
    // survivors from rewritten files (their un-matched rows) + all updates
    val merged =
      if (touchedNames.isEmpty) updates
      else {
        val touchedDf = spark.read.parquet(
          touchedNames.map(n => s"${filesDir(root)}/$n"): _*)
        touchedDf.join(updates.select(col(key)), Seq(key), "left_anti")
          .unionByName(updates)
      }
    val newNames = writeFiles(spark, root, merged, nNewFiles, key)
    writeManifest(root, cur + 1, untouched ++ newNames)
    cur + 1
  }

  /** Garbage-collect history: keep the newest `keepVersions` manifests,
    * delete older manifests and every data file no kept manifest
    * references — the VACUUM every COW table needs, since upserts only
    * ever ADD files. Pure metadata work (manifest set arithmetic) plus
    * file deletes; returns (versions dropped, files deleted). Time
    * travel remains exact for every kept version because a file is
    * deleted only when NO kept manifest lists it. */
  def vacuum(root: String, keepVersions: Int = 1): (Int, Int) = {
    require(keepVersions >= 1, "must keep at least the newest version")
    val versions = listVersions(root)
    val (drop, keep) = versions.splitAt(math.max(0, versions.size - keepVersions))
    val referenced = keep.flatMap(v => manifest(root, v)).toSet
    val deleted = Files.list(Paths.get(filesDir(root))).iterator().asScala
      .filter(p => !referenced.contains(p.getFileName.toString))
      .map { p => Files.delete(p); 1 }.sum
    drop.foreach(v => Files.delete(Paths.get(manifestDir(root), s"v$v.list")))
    (drop.size, deleted)
  }
}
