package graft.operators

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.model.Tables

/** Independent semantic checks for the round-13 TPC-H completion batch
  * (q4/q7/q8/q13/q14/q15/q17/q19/q22). Each test recomputes the answer
  * by a DIFFERENT plan shape (or exact driver-side decimal arithmetic)
  * than the query under test, so a planner or decimal-chain regression
  * cannot cancel out of both sides. The DuckDB oracle covers the
  * cross-engine hash; these cover the invariants an oracle diff cannot
  * localize (orderedness, partition/tiling identities, argmax sets).
  */
class TpchCanonSpec extends AnyFunSuite with SparkTest {

  /** Exact driver-side discounted-price sum over collected
    * (l_extendedprice, l_discount) rows — the same per-factor
    * decimal casts the engine states, folded in BigDecimal. */
  private def exactDiscRevenue(rows: Array[(Double, Double)]): Double =
    rows.map { case (ep, d) =>
      new JBD(ep).setScale(2, RoundingMode.HALF_UP)
        .multiply(JBD.ONE.subtract(new JBD(d).setScale(4, RoundingMode.HALF_UP)))
    }.foldLeft(JBD.ZERO)(_.add(_)).doubleValue()

  test("q4_priority_waiting equals a distinct-count recomputation and partitions the quarter") {
    val out = RelationalOps.q4PriorityWaiting(spark, sf).collect()
    assert(out.nonEmpty)
    val ps = out.map(_.getAs[String]("o_orderpriority")).toSeq
    assert(ps == ps.sorted, "not priority-ordered")
    assert(ps.distinct == ps, "duplicate priority rows")
    // recompute via INNER join + distinct orderkeys (vs the semi join):
    // an order with 3 late lines must still count once
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    val expect = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .select(col("o_orderpriority"), col("o_orderkey")).distinct()
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(r => r.getString(0) -> r.getAs[Long]("order_count")).toMap == expect)
    // every counted order has >= 1 late line by construction; the count
    // can never exceed the quarter's order total
    val quarterTotal = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi).count()
    assert(out.map(_.getAs[Long]("order_count")).sum <= quarterTotal)
  }

  test("q7_nation_volume is the symmetric pair table and matches a WHERE-side recomputation") {
    // sf0.001's two-nation trade window is empty; the nonempty case
    // needs sf0.01 (4 rows there, verified against DuckDB)
    val sf01 = "/root/testdata/sf0.01"
    val out = RelationalOps.q7NationVolume(spark, sf01).collect()
    assert(out.nonEmpty)
    val names = Set("NATION_1", "NATION_2")
    out.foreach { r =>
      val (s, c) = (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))
      assert(names(s) && names(c) && s != c, s"illegal pair ($s,$c)")
      assert(r.getAs[Int]("l_year") >= 1996 && r.getAs[Int]("l_year") < 1998)
      assert(r.getAs[Double]("revenue") > 0.0)
    }
    // recompute one cell the textbook way: join everything, filter in a
    // WHERE at the end (no pre-pruned broadcast slices), exact decimals
    val r0 = out.head
    val cell = Tables.lineitem(spark, sf01)
      .join(Tables.orders(spark, sf01), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf01), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf01), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf01).select(col("n_nationkey").as("snk"),
        col("n_name").as("sname")), col("s_nationkey") === col("snk"))
      .join(Tables.nation(spark, sf01).select(col("n_nationkey").as("cnk"),
        col("n_name").as("cname")), col("c_nationkey") === col("cnk"))
      .filter(col("sname") === r0.getAs[String]("supp_nation") &&
        col("cname") === r0.getAs[String]("cust_nation") &&
        year(col("l_shipdate")) === r0.getAs[Int]("l_year") &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_extendedprice"), col("l_discount")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(math.abs(r0.getAs[Double]("revenue") - exactDiscRevenue(cell)) < 1e-6)
  }

  test("q8_market_share stays in [0,1] and both fraction legs match independent sums") {
    val out = RelationalOps.q8MarketShare(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ms = r.getAs[Double]("mkt_share")
      assert(ms >= 0.0 && ms <= 1.0, s"share $ms out of range")
    }
    // independent legs: build the joined slice ONCE, compute numerator
    // and denominator as two separate exact aggregates, divide driver-side
    val slice = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sf)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf)
        .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey")), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf)
        .join(Tables.nation(spark, sf).select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation")), col("s_nationkey") === col("snk"))
        .select(col("s_suppkey"), col("supp_nation")),
        col("l_suppkey") === col("s_suppkey"))
      .select(year(col("o_orderdate")).as("y"), col("supp_nation"),
        col("l_extendedprice"), col("l_discount")).collect()
    val byYear = slice.groupBy(_.getAs[Int]("y"))
    assert(out.map(_.getAs[Int]("o_year")).toSet == byYear.keySet)
    out.foreach { r =>
      val rows = byYear(r.getAs[Int]("o_year"))
      val num = exactDiscRevenue(rows.filter(_.getAs[String]("supp_nation") == "NATION_5")
        .map(x => (x.getAs[Double]("l_extendedprice"), x.getAs[Double]("l_discount"))))
      val den = exactDiscRevenue(rows
        .map(x => (x.getAs[Double]("l_extendedprice"), x.getAs[Double]("l_discount"))))
      // 5e-7: the reported share is round-6 presented (r15 double lint)
      assert(math.abs(r.getAs[Double]("mkt_share") - num / den) < 5e-7)
    }
  }

  test("q13_order_counts tiles customers exactly and weights back to the order count") {
    val out = RelationalOps.q13OrderCounts(spark, sf).collect()
    assert(out.nonEmpty)
    // partition identity: every customer lands in exactly one bucket
    assert(out.map(_.getAs[Long]("custdist")).sum == Tables.customer(spark, sf).count())
    // weighted identity: sum(c_count * custdist) == non-urgent orders
    // whose customer exists (the LEFT side can only count real custkeys)
    val nonUrgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .join(Tables.customer(spark, sf).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(out.map(r => r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum
      == nonUrgent)
    // ordering contract: custdist desc, then c_count desc
    val keys = out.map(r => (-r.getAs[Long]("custdist"), -r.getAs[Long]("c_count"))).toSeq
    assert(keys == keys.sorted, "not (custdist desc, c_count desc) ordered")
  }

  test("q14_promo_share matches exact decimal legs and is a true percentage") {
    val row = RelationalOps.q14PromoShare(spark, sf).head()
    val share = row.getAs[Double]("promo_revenue")
    assert(share >= 0.0 && share <= 100.0)
    val month = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .join(Tables.part(spark, sf).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_type"), col("l_extendedprice"), col("l_discount")).collect()
    assert(row.getAs[Long]("n_lines") == month.length)
    val num = exactDiscRevenue(month.filter(_.getString(0) == "PROMO")
      .map(r => (r.getDouble(1), r.getDouble(2))))
    val den = exactDiscRevenue(month.map(r => (r.getDouble(1), r.getDouble(2))))
    // 5e-7: the reported percentage is round-6 presented (r15 double lint)
    assert(math.abs(share - 100.0 * num / den) < 5e-7)
  }

  test("q15_top_supplier is exactly the argmax set of the per-supplier revenue table") {
    val out = RelationalOps.q15TopSupplier(spark, sf).collect()
    assert(out.nonEmpty)
    // brute force: per-supplier exact revenue on the driver, then argmax
    val lines = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount")).collect()
    val perSupp = lines.groupBy(_.getLong(0)).map { case (k, rs) =>
      k -> rs.map { r =>
        new JBD(r.getDouble(1)).setScale(2, RoundingMode.HALF_UP)
          .multiply(JBD.ONE.subtract(
            new JBD(r.getDouble(2)).setScale(4, RoundingMode.HALF_UP)))
      }.foldLeft(JBD.ZERO)(_.add(_))
    }
    val maxRev = perSupp.values.max
    val winners = perSupp.filter(_._2.compareTo(maxRev) == 0).keySet
    assert(out.map(_.getAs[Long]("s_suppkey")).toSet == winners)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("total_revenue") - maxRev.doubleValue()) < 1e-6)
    }
    val sk = out.map(_.getAs[Long]("s_suppkey")).toSeq
    assert(sk == sk.sorted)
  }

  test("q17_small_qty_revenue matches a driver-side threshold recomputation") {
    val row = RelationalOps.q17SmallQtyRevenue(spark, sf).head()
    assert(row.getAs[Long]("n_lines") > 0)
    val li = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice")).collect()
    // the engine's exact threshold chain: 0.2 * (double(decimal sum) / double(count))
    val thresh = li.groupBy(_.getLong(0)).map { case (k, rs) =>
      val s = rs.map(r => new JBD(r.getDouble(1)).setScale(2, RoundingMode.HALF_UP))
        .foldLeft(JBD.ZERO)(_.add(_))
      k -> 0.2 * (s.doubleValue() / rs.length.toDouble)
    }
    val kept = li.filter(r => r.getDouble(1) < thresh(r.getLong(0)))
    assert(row.getAs[Long]("n_lines") == kept.length)
    val exact = kept.map(r => new JBD(r.getDouble(2)).setScale(2, RoundingMode.HALF_UP))
      .foldLeft(JBD.ZERO)(_.add(_)).doubleValue() / 7.0
    assert(math.abs(row.getAs[Double]("avg_yearly") - exact) < 1e-6)
  }

  test("q19_bracket_revenue equals the driver-applied disjunction over the envelope slice") {
    val row = RelationalOps.q19BracketRevenue(spark, sf).head()
    assert(row.getAs[Long]("n_lines") > 0)
    // recompute WITHOUT the derived envelopes: full join, then the raw
    // disjunction on the driver — proves envelope-pruning changed nothing
    val joined = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("p_size"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount")).collect()
    val kept = joined.filter { r =>
      val (b, s, q) = (r.getString(0), r.getInt(1), r.getDouble(2))
      (b == "Brand#12" && s >= 1 && s <= 10 && q >= 1 && q <= 11) ||
      (b == "Brand#23" && s >= 1 && s <= 20 && q >= 10 && q <= 20) ||
      (b == "Brand#24" && s >= 1 && s <= 30 && q >= 20 && q <= 30)
    }
    assert(row.getAs[Long]("n_lines") == kept.length)
    val exact = exactDiscRevenue(kept.map(r => (r.getDouble(3), r.getDouble(4))))
    assert(math.abs(row.getAs[Double]("revenue") - exact) < 1e-6)
  }

  test("q12_late_lines_priority partitions the late slice and matches a driver recount") {
    val out = RelationalOps.q12LateLinesPriority(spark, sf).collect()
    assert(out.nonEmpty)
    val ls = out.map(_.getAs[String]("l_linestatus")).toSeq
    assert(ls == ls.sorted && ls.distinct == ls)
    // driver recount from the raw join slice; high+low must tile it
    val slice = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_linestatus"), col("o_orderpriority")).collect()
    val critical = Set("1-URGENT", "2-HIGH")
    val byStatus = slice.groupBy(_.getString(0))
    assert(out.map(_.getAs[String]("l_linestatus")).toSet == byStatus.keySet)
    out.foreach { r =>
      val rows = byStatus(r.getAs[String]("l_linestatus"))
      val hi = rows.count(x => critical(x.getString(1)))
      assert(r.getAs[Long]("high_line_count") == hi)
      assert(r.getAs[Long]("low_line_count") == rows.length - hi)
    }
  }

  test("q21_waiting_supplier is exactly the sole-late-supplier order count per NATION_3 supplier") {
    val out = RelationalOps.q21WaitingSupplier(spark, sf).collect()
    assert(out.nonEmpty)
    // driver-side set recomputation with the textbook EXISTS semantics
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("unix_millis(cast(l_shipdate as timestamp))").as("ship_ms")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fOrders = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"),
        expr("unix_millis(cast(o_orderdate as timestamp))").as("ord_ms")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dayMs = 86400000L
    val latePairs = li.collect {
      case (ok, sk, ship) if fOrders.contains(ok) && ship > fOrders(ok) + 60 * dayMs =>
        (ok, sk)
    }.distinct
    val lateByOrder = latePairs.groupBy(_._1)
    val suppsByOrder = li.map(t => (t._1, t._2)).distinct.groupBy(_._1)
    val nat3 = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val waits = lateByOrder.collect {
      // sole late supplier on a multi-supplier order, in the nation slice
      case (ok, Array((_, sk))) if suppsByOrder(ok).length >= 2 && nat3.contains(sk) =>
        nat3(sk)
    }.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(out.map(r => r.getAs[String]("s_name") -> r.getAs[Long]("numwait")).toMap
      == waits)
    // ordering contract: numwait desc then name
    val keys = out.map(r => (-r.getAs[Long]("numwait"), r.getAs[String]("s_name"))).toSeq
    assert(keys == keys.sorted)
  }

  test("q9_product_profit matches an exact decimal driver recomputation per (nation, year)") {
    val out = RelationalOps.q9ProductProfit(spark, sf).collect()
    assert(out.nonEmpty)
    // ordering contract: nation asc, year desc
    val keys = out.map(r => (r.getAs[String]("n_name"), -r.getAs[Int]("o_year"))).toSeq
    assert(keys == keys.sorted)
    val slice = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_name").like("%gear%"))
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name"), year(col("o_orderdate")).as("y"),
        col("l_extendedprice"), col("l_discount"), col("l_tax")).collect()
    val byKey = slice.groupBy(r => (r.getString(0), r.getInt(1)))
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSet == byKey.keySet)
    out.foreach { r =>
      val rows = byKey((r.getString(0), r.getInt(1)))
      val exact = rows.map { x =>
        val ep = new JBD(x.getDouble(2)).setScale(2, RoundingMode.HALF_UP)
        val d = new JBD(x.getDouble(3)).setScale(4, RoundingMode.HALF_UP)
        val t = new JBD(x.getDouble(4)).setScale(4, RoundingMode.HALF_UP)
        ep.multiply(JBD.ONE.subtract(d)).subtract(ep.multiply(t))
      }.foldLeft(JBD.ZERO)(_.add(_)).doubleValue()
      assert(math.abs(r.getAs[Double]("sum_profit") - exact) < 1e-6)
    }
  }

  test("q22_idle_customers matches a driver-side wealthy-and-idle recomputation") {
    val out = RelationalOps.q22IdleCustomers(spark, sf).collect()
    assert(out.nonEmpty)
    val sel = Tables.customer(spark, sf)
      .filter(col("c_nationkey") % 2 === 1)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal")).collect()
    val pos = sel.filter(_.getDouble(2) > 0.0)
    val avg = pos.map(r => new JBD(r.getDouble(2)).setScale(2, RoundingMode.HALF_UP))
      .foldLeft(JBD.ZERO)(_.add(_)).doubleValue() / pos.length.toDouble
    val recent = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val idle = sel.filter(r => r.getDouble(2) > avg && !recent(r.getLong(0)))
    val byNation = idle.groupBy(_.getInt(1))
    assert(out.map(_.getAs[Int]("c_nationkey")).toSet == byNation.keySet)
    out.foreach { r =>
      val rows = byNation(r.getAs[Int]("c_nationkey"))
      assert(r.getAs[Long]("numcust") == rows.length)
      val exact = rows.map(x => new JBD(x.getDouble(2)).setScale(2, RoundingMode.HALF_UP))
        .foldLeft(JBD.ZERO)(_.add(_)).doubleValue()
      assert(math.abs(r.getAs[Double]("totacctbal") - exact) < 1e-6)
    }
    val nk = out.map(_.getAs[Int]("c_nationkey")).toSeq
    assert(nk == nk.sorted)
  }

  private val sf01 = "/root/testdata/sf0.01"

  test("q2_min_cost_supplier rows achieve the region-wide per-part minimum (driver recompute)") {
    val out = RelationalOps.q2MinCostSupplier(spark, sf01).collect()
    assert(out.nonEmpty)
    // driver recompute: per (part, supplier-in-EUROPE) min price in
    // exact cents, then the per-part min — every output row must sit AT
    // its part's min, and every min-achieving (part, supplier) in the
    // slice must appear (LIMIT permitting; the sf0.01 result is small)
    val euro = Tables.supplier(spark, sf01)
      .join(Tables.nation(spark, sf01), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf01).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val sliceParts = Tables.part(spark, sf01)
      .filter(col("p_size") === 5 && col("p_type") === "STANDARD")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val pairMin = Tables.lineitem(spark, sf01)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .collect()
      .filter(r => sliceParts(r.getLong(0)) && euro(r.getLong(1)))
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.map(r => math.round(r.getDouble(2) * 100)).min }
    val partMin = pairMin.groupBy(_._1._1).map { case (p, m) => p -> m.values.min }
    val expectPairs = pairMin.filter { case ((p, _), c) => c == partMin(p) }.keySet
    val gotPairs = out.map(r =>
      (r.getAs[Long]("p_partkey"), math.round(r.getAs[Double]("supply_cost") * 100))).toSet
    assert(out.forall(r => math.round(r.getAs[Double]("supply_cost") * 100) ==
      partMin(r.getAs[Long]("p_partkey"))), "a row is not at its part's min cost")
    assert(out.length == math.min(100, expectPairs.size))
    assert(gotPairs.map(_._1).subsetOf(expectPairs.map(_._1)))
  }

  test("q11_important_stock equals the exact-decimal threshold recompute") {
    val out = RelationalOps.q11ImportantStock(spark, sf01).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[Double]("stock_value")).toMap
    assert(out.nonEmpty)
    val natSupp = Tables.supplier(spark, sf01)
      .join(Tables.nation(spark, sf01).filter(col("n_name") === "NATION_7"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val vals = Tables.lineitem(spark, sf01)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"), col("l_quantity"))
      .collect().filter(r => natSupp(r.getLong(1)))
      .groupBy(_.getLong(0))
      .map { case (p, rs) => p -> rs.map(r =>
        new JBD(r.getDouble(2)).setScale(2, RoundingMode.HALF_UP)
          .multiply(new JBD(r.getDouble(3)).setScale(2, RoundingMode.HALF_UP)))
        .foldLeft(JBD.ZERO)(_.add(_)) }
    val total = vals.values.foldLeft(JBD.ZERO)(_.add(_))
    val expect = vals.filter { case (_, v) =>
      v.multiply(new JBD(10000)).compareTo(total) > 0 }
    assert(out.keySet == expect.keySet, "threshold set differs from exact recompute")
    for ((p, v) <- expect)
      assert(math.abs(out(p) - v.doubleValue()) < 1e-6)
  }

  test("q16_supplier_count equals a set-based driver recompute with both exclusions") {
    val out = RelationalOps.q16SupplierCount(spark, sf01).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getAs[Long]("supplier_cnt"))
    val bad = Tables.supplier(spark, sf01).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val attrs = Tables.part(spark, sf01)
      .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 3, 5, 7, 9))
      .collect().map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[String]("p_brand"), r.getAs[String]("p_type"), r.getAs[Int]("p_size"))).toMap
    val expect = Tables.lineitem(spark, sf01)
      .select(col("l_partkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (p, s) => attrs.contains(p) && !bad(s) }
      .groupBy { case (p, _) => attrs(p) }
      .map { case (g, prs) => g -> prs.map(_._2).distinct.length.toLong }
    assert(out.toMap == expect)
    // ordering: cnt desc, then the attribute triple
    val keys = out.map { case ((b, t, s), c) => (-c, b, t, s) }.toSeq
    assert(keys == keys.sorted)
  }

  test("q20_promotion_parts suppliers each hold an excess pair (driver recompute)") {
    val out = RelationalOps.q20PromotionParts(spark, sf01).collect()
      .map(_.getAs[Long]("s_suppkey")).toSet
    assert(out.nonEmpty)
    val slice = Tables.part(spark, sf01).filter(col("p_name").startsWith("red"))
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val rows = Tables.lineitem(spark, sf01)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        expr("year(l_shipdate)").as("y"))
      .collect().filter(r => slice(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100), r.getAs[Int]("y")))
    val yearQty = rows.filter(_._4 == 1997).groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._3).sum }
    val excessSupp = rows.groupBy(r => (r._1, r._2))
      .collect { case ((p, s), rs)
        if yearQty.contains(p) && 2 * rs.map(_._3).sum > yearQty(p) => s }.toSet
    val nat5 = Tables.supplier(spark, sf01)
      .join(Tables.nation(spark, sf01).filter(col("n_name") === "NATION_5"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    assert(out == excessSupp.intersect(nat5))
  }
}
