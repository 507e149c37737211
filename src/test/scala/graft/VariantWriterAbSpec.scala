package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnalyticOps

/** A/B/C pricing of the variant WRITER half (r16 verdict item 6):
  * string re-parse (default path) vs read-time `parse_json` (the
  * `payload=variant` flag) vs SHREDDED variant written by
  * `Payload.writeShredded` — the regime the read-side flag exists for,
  * where the parse disappears from query time entirely. Env-gated:
  * `SPARK_GRAFT_AB_DIR` names the events dir (sf0.1 or the 10×
  * replica); numbers land in SCALING.md round 17. Value parity across
  * all three arms is asserted unconditionally — pricing without parity
  * would be meaningless. */
class VariantWriterAbSpec extends AnyFunSuite with SparkTest {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def timeMin2(mk: () => DataFrame): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  test("A/B/C: string vs read-variant vs shredded-variant on the JSON probe family") {
    assume(sys.env.contains("SPARK_GRAFT_AB_DIR"), "set SPARK_GRAFT_AB_DIR to run")
    val dir = sys.env("SPARK_GRAFT_AB_DIR")
    val out = tempDir("variant_shred")
    graft.api.Payload.writeShredded(spark, dir, out)
    spark.conf.set("spark.sql.variant.allowReadingShredded", "true")

    // the shredded arms: same projections as jsonPathPack/typedPayload,
    // but the parse happened at WRITE time — `pv` reads typed
    // sub-columns (pushVariantIntoScan folds the gets into the scan)
    def shreddedPack() = spark.read.parquet(out)
      .select(col("event_id"),
        try_variant_get(col("pv"), "$.k", "int").as("k_val"),
        (try_variant_get(col("pv"), "$.k", "int") % 10).as("k_mod"),
        try_variant_get(col("pv"), "$.missing", "string").as("absent"))
      .orderBy("event_id")
    def shreddedTyped() = spark.read.parquet(out)
      .select(col("event_id"),
        try_variant_get(col("pv"), "$.k", "int").as("k"),
        (try_variant_get(col("pv"), "$.k", "int") % 10).as("k_mod"),
        (try_variant_get(col("pv"), "$.k", "int") > 50).as("k_big"))
      .orderBy("event_id")

    // arm D (r17 verdict item 5): the SAME shredded layout written
    // through the CowTable lake path — the probe win must survive the
    // table format (manifest read, explicit variant schema, range-
    // clustered files)
    val cowRoot = tempDir("variant_cow")
    graft.sources.CowTable.initShredded(spark, cowRoot,
      graft.model.Tables.events(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props")),
      "event_id", nFiles = 8, jsonCols = Seq("props"))
    def cowPack() = graft.sources.CowTable.read(spark, cowRoot)
      .select(col("event_id"),
        try_variant_get(col("props"), "$.k", "int").as("k_val"),
        (try_variant_get(col("props"), "$.k", "int") % 10).as("k_mod"),
        try_variant_get(col("props"), "$.missing", "string").as("absent"))
      .orderBy("event_id")

    // value parity: all arms agree on every row
    val stringPack = rows(AnalyticOps.jsonPathPack(spark, dir))
    spark.conf.set(graft.api.Payload.ModeKey, "variant")
    val readVarPack = try rows(AnalyticOps.jsonPathPack(spark, dir))
      finally spark.conf.unset(graft.api.Payload.ModeKey)
    assert(readVarPack == stringPack, "read-variant arm diverged")
    assert(rows(shreddedPack()) == stringPack, "shredded arm diverged")
    assert(rows(cowPack()) == stringPack, "cow-shredded arm diverged")

    val stringTyped = rows(AnalyticOps.typedPayload(spark, dir))
    assert(rows(shreddedTyped()) == stringTyped, "shredded typed arm diverged")

    // warm every arm once (codegen + JIT) so the first-priced arm isn't
    // the one paying compilation
    AnalyticOps.jsonPathPack(spark, dir).write.format("noop").mode("overwrite").save()
    shreddedPack().write.format("noop").mode("overwrite").save()
    cowPack().write.format("noop").mode("overwrite").save()
    AnalyticOps.typedPayload(spark, dir).write.format("noop").mode("overwrite").save()
    shreddedTyped().write.format("noop").mode("overwrite").save()

    // pricing, min-of-2 per arm
    val tStringPack = timeMin2(() => AnalyticOps.jsonPathPack(spark, dir))
    spark.conf.set(graft.api.Payload.ModeKey, "variant")
    val tReadVarPack = try timeMin2(() => AnalyticOps.jsonPathPack(spark, dir))
      finally spark.conf.unset(graft.api.Payload.ModeKey)
    val tShredPack = timeMin2(() => shreddedPack())
    val tCowPack = timeMin2(() => cowPack())

    val tStringTyped = timeMin2(() => AnalyticOps.typedPayload(spark, dir))
    spark.conf.set(graft.api.Payload.ModeKey, "variant")
    val tReadVarTyped = try timeMin2(() => AnalyticOps.typedPayload(spark, dir))
      finally spark.conf.unset(graft.api.Payload.ModeKey)
    val tShredTyped = timeMin2(() => shreddedTyped())

    info(f"json_path_pack: string=$tStringPack%.3fs readVariant=$tReadVarPack%.3fs shredded=$tShredPack%.3fs cowShredded=$tCowPack%.3fs dir=$dir")
    info(f"typed_payload:  string=$tStringTyped%.3fs readVariant=$tReadVarTyped%.3fs shredded=$tShredTyped%.3fs dir=$dir")
    // the shredded scan must also show the parse GONE from the plan
    val plan = shreddedPack().queryExecution.executedPlan.toString
    assert(!plan.contains("parse_json"), s"shredded arm still parses at read:\n$plan")
  }
}
