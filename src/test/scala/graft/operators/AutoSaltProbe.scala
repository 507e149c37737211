package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B pricing probe for the AutoSaltRule on a CONSTRUCTED hot key
  * (round-14 verdict item 3's "Done" clause) — Test scope, run via
  *
  *   sbt "Test/runMain graft.AutoSaltProbe [factRows] [hotPct]"
  *
  * Shape: factRows (default 20M) fact rows, hotPct (default 90) % of
  * them on ONE key, a 100k-key dim side, shuffle join forced
  * (autoBroadcastJoinThreshold=-1) and AQE OFF — the exact regime the
  * rule exists for (pre-AQE engines, AQE disabled, or a hot KEY inside
  * a median-sized partition where AQE's size stats are blind). The
  * query joins and reduces to a global 1-row aggregate so the timed
  * cost is the JOIN's skew, not a downstream keyed shuffle. Prints one
  * JSON line with off/on wall seconds (min of 2) and the parity check. */
object AutoSaltProbe {
  def main(args: Array[String]): Unit = {
    val factRows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val hotPct = args.drop(1).headOption.map(_.toInt).getOrElse(90)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations = Seq(graft.plans.AutoSaltRule(spark))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    def fact = spark.range(factRows).select(
      when(pmod(col("id"), lit(100)) < hotPct, lit(7L))
        .otherwise(pmod(col("id"), lit(100000L))).as("user_id"),
      col("id").as("payload"))
    def dim = spark.range(100000L).select(col("id").as("user_id"),
      (col("id") * 3L).as("weight"))
    def run(): Long = fact.join(dim, "user_id")
      .agg(sum(col("payload") + col("weight"))).head().getLong(0)

    // outer-join probe: LEFT OUTER against HALF the dim (fact keys >=
    // 50000 null-extend) so null-extension errors surface in the counts
    def runOuter(): String = fact
      .join(dim.filter(col("user_id") < 50000L), Seq("user_id"), "left_outer")
      .agg(sum(col("payload")).as("sp"), sum(col("weight")).as("sw"),
        count(lit(1)).as("n"), count(col("weight")).as("nw"))
      .head().toString

    // aggregate probe: collect_list is the holistic case whose partial
    // state IS the data (map-side combine cannot collapse the hot key);
    // a quarter of the fact keeps the hot group's one irreducible output
    // array (size == hot rows) inside sane single-array bounds
    def factAgg = fact.filter(pmod(col("payload"), lit(4)) === 0)
    def runAgg(): (Long, Long) = {
      val r = factAgg.groupBy("user_id")
        .agg(count(lit(1)).as("n"), size(collect_list(col("payload"))).as("m"))
        .agg(sum(col("n")), max(col("m"))).head()
      (r.getLong(0), r.getInt(1).toLong)
    }

    // the diagnostic half: measure + register the constructed hot key —
    // both passes (exact + Misra-Gries sketch) must agree
    val share = graft.plans.AutoSalt.analyzeAndRegister(spark, fact, "user_id")
    spark.conf.unset(graft.plans.AutoSalt.KeyPrefix + "user_id")
    val t0s = System.nanoTime()
    val shareSk = graft.plans.AutoSalt.analyzeAndRegisterSketch(spark, fact, "user_id")
    val sketchSec = (System.nanoTime() - t0s) / 1e9

    def timed(body: => Any): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    spark.conf.set(graft.plans.AutoSalt.EnabledKey, "false")
    val offParity = run() // warm code paths once, record the off answer
    val off = math.min(timed(run()), timed(run()))
    val offOuterParity = runOuter()
    val offOuter = math.min(timed(runOuter()), timed(runOuter()))
    val offAggParity = runAgg()
    val offAgg = math.min(timed(runAgg()), timed(runAgg()))
    spark.conf.set(graft.plans.AutoSalt.EnabledKey, "true")
    val onParity = run()
    val on = math.min(timed(run()), timed(run()))
    val onOuterParity = runOuter()
    val onOuter = math.min(timed(runOuter()), timed(runOuter()))
    val onAggParity = runAgg()
    val onAgg = math.min(timed(runAgg()), timed(runAgg()))
    println(f"""{"probe":"auto_salt","fact_rows":$factRows,"hot_pct":$hotPct,""" +
      f""""hot_share_pct":$share%.2f,"sketch_share_pct":$shareSk%.2f,""" +
      f""""sketch_sec":$sketchSec%.2f,"off_sec":$off%.2f,"on_sec":$on%.2f,""" +
      f""""outer_off_sec":$offOuter%.2f,"outer_on_sec":$onOuter%.2f,""" +
      f""""agg_off_sec":$offAgg%.2f,"agg_on_sec":$onAgg%.2f,""" +
      s""""parity":${offParity == onParity},""" +
      s""""outer_parity":${offOuterParity == onOuterParity},""" +
      s""""agg_parity":${offAggParity == onAggParity}}""")
    spark.stop()
  }
}
