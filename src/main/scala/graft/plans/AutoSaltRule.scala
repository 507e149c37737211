package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, count, lit, max, sum}
import org.apache.spark.sql.types.LongType

import graft.api.GraftConfig

/** Automatic skew salting as an ENGINE rule (round-14 verdict item 3):
  * the manual toolkit — diagnose with `heavy_hitters`/`key_skew_profile`,
  * rewrite by hand as `salted_agg`/`salted_join` — promoted to a
  * flag-gated optimizer rule, so the salt+replicate rewrite is something
  * the engine applies, not a pattern users must copy.
  *
  * The two halves mirror how CBO consumes ANALYZE stats:
  *
  *  1. [[AutoSalt.analyzeAndRegister]] is the diagnostic pass (the
  *     `heavy_hitters` shape: one map-side-combined count per key, then a
  *     1-row max/total aggregate). When the hottest key's share crosses
  *     `spark.graft.autoSalt.minSharePct` it registers the column under
  *     `spark.graft.autoSalt.key.<name> = <buckets>`. At 100 TB this pass
  *     costs the KEY space, not the row space, and runs once per
  *     pipeline, exactly like ANALYZE TABLE.
  *  2. [[AutoSaltRule]] (injected by `GraftExtensions`, gated by
  *     `spark.graft.autoSalt.enabled`) rewrites qualifying INNER
  *     equi-joins whose key is registered: the larger side gains
  *     `__graft_salt_f = pmod(monotonically_increasing_id(), S)`, the
  *     smaller side replicates S× via `explode(array(0..S-1))`, and the
  *     join key widens to (key, salt) — a hot key's rows spread over S
  *     reducers while every fact row still matches EXACTLY the one
  *     replica carrying its salt, so the output is bit-identical to the
  *     unsalted join (PlanSpec pins both the injected plan shape and the
  *     parity).
  *
  * Scope guards (all deliberate):
  *  - INNER joins only — outer joins would need null-extension-aware
  *    replication accounting; the manual `salted_join` covers those by
  *    construction when needed.
  *  - joins carrying an explicit hint are the USER'S plan — untouched.
  *  - a replicate side already under `autoBroadcastJoinThreshold` will
  *    broadcast anyway (no shuffle to skew) — skipped.
  *  - already-salted joins (a `__graft_salt` output) are skipped, which
  *    also makes the rule a fixed point under the optimizer's re-runs.
  *
  * This is the engine analog of AQE's skew-join split, for the case AQE
  * cannot see: AQE reads PARTITION sizes post-shuffle, so a hot KEY
  * hiding inside a median-sized partition (or a run with AQE disabled)
  * never triggers it; key-frequency stats see the key itself. */
object AutoSalt {
  val EnabledKey = "spark.graft.autoSalt.enabled"
  /** Per-column registration: `spark.graft.autoSalt.key.<col> = buckets`. */
  val KeyPrefix = "spark.graft.autoSalt.key."
  /** Hot-key share (percent of table rows) above which
    * [[analyzeAndRegister]] registers the key. 1% of 100 TB landing on
    * one reducer of a 1000-partition shuffle is a 10× hot spot — the
    * default is deliberately sensitive. */
  val MinSharePctKey = "spark.graft.autoSalt.minSharePct"
  val DefaultBuckets = 16

  def enabled(spark: SparkSession): Boolean =
    GraftConfig.get(spark, EnabledKey, "false").trim.equalsIgnoreCase("true")

  def bucketsFor(spark: SparkSession, keyName: String): Option[Int] = {
    val b = GraftConfig.getInt(spark, KeyPrefix + keyName, 0)
    if (b >= 2) Some(b) else None
  }

  /** The diagnostic pass: hottest-key share of `keyCol` in percent (the
    * `heavy_hitters` aggregation shape — key-space cost, two metadata
    * aggregates). Registers the column for [[AutoSaltRule]] when the
    * share crosses the threshold; returns the measured share either way. */
  def analyzeAndRegister(spark: SparkSession, df: DataFrame, keyCol: String,
      buckets: Int = DefaultBuckets): Double = {
    val row = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).cast("double"), sum(col("n")).cast("double")).head()
    val sharePct =
      if (row.isNullAt(1) || row.getDouble(1) == 0.0) 0.0
      else 100.0 * row.getDouble(0) / row.getDouble(1)
    val threshold = GraftConfig.get(spark, MinSharePctKey, "1.0").toDouble
    if (sharePct >= threshold)
      spark.conf.set(KeyPrefix + keyCol, buckets.toString)
    sharePct
  }
}

/** The rewrite half — see [[AutoSalt]] for the contract. */
case class AutoSaltRule(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val SaltPrefix = "__graft_salt"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!AutoSalt.enabled(spark)) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), hint)
          if hint == JoinHint.NONE && !alreadySalted(j) =>
        registeredKeyBuckets(j) match {
          case Some(buckets) => rewrite(j, buckets)
          case None => j
        }
    }
  }

  private def alreadySalted(j: Join): Boolean =
    (j.left.output ++ j.right.output).exists(_.name.startsWith(SaltPrefix))

  /** The join qualifies when some equi-conjunct keys a column registered
    * via [[AutoSalt.KeyPrefix]] (on either side) AND the replicate side
    * is too big to broadcast anyway. */
  private def registeredKeyBuckets(j: Join): Option[Int] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val keyed = conjuncts.collect {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b)) ||
             (j.left.outputSet.contains(b) && j.right.outputSet.contains(a)) =>
        AutoSalt.bucketsFor(spark, a.name)
          .orElse(AutoSalt.bucketsFor(spark, b.name))
    }.flatten.headOption
    keyed.filter { _ =>
      val dimSize = j.left.stats.sizeInBytes.min(j.right.stats.sizeInBytes)
      val bcast = spark.sessionState.conf.autoBroadcastJoinThreshold
      bcast < 0 || dimSize > bcast
    }
  }

  private def rewrite(j: Join, buckets: Int): LogicalPlan = {
    val factIsLeft = j.left.stats.sizeInBytes >= j.right.stats.sizeInBytes
    val fact = if (factIsLeft) j.left else j.right
    val dim = if (factIsLeft) j.right else j.left
    // fact side: any row-varying deterministic-per-run value works as the
    // salt — each row joins exactly the dim replica carrying its salt, so
    // the VALUE never reaches the output, only the partitioning
    val saltF = Alias(
      Pmod(MonotonicallyIncreasingID(), Literal(buckets.toLong)),
      s"${SaltPrefix}_f")()
    val factSalted = Project(fact.output :+ saltF, fact)
    // dim side: S replicas, one per salt value, via explode — a logical
    // Generate, so column pruning/codegen treat it like any lateral view
    val saltD = AttributeReference(s"${SaltPrefix}_d", LongType, nullable = false)()
    val dimReplicated = Generate(
      Explode(CreateArray((0L until buckets.toLong).map(Literal(_)))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(saltD), child = dim)
    val newCond = And(j.condition.get, EqualTo(saltF.toAttribute, saltD))
    val salted =
      if (factIsLeft) Join(factSalted, dimReplicated, Inner, Some(newCond), j.hint)
      else Join(dimReplicated, factSalted, Inner, Some(newCond), j.hint)
    // restore the original output (drop both salt columns)
    Project(j.output, salted)
  }
}
