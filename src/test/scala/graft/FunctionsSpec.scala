package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{OutcomeAggregator, VectorFunctions}

/** Custom expression / aggregator coverage. */
class FunctionsSpec extends AnyFunSuite with SparkTest {

  test("DotProduct matches the interpreted higher-order composition bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2), Array(0.3, 0.7)),
      (Array.empty[Double], Array.empty[Double]))
      .toDF("a", "b")
    val got = df.select(
      VectorFunctions.dot_product(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)").as("ref"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("DotProduct is strict about mismatched lengths (like list_dot_product)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val err = intercept[Exception] {
      df.select(VectorFunctions.dot_product(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(err).exists(m => m != null && m.contains("lengths differ")))
  }

  test("DotProduct is null-safe and rejects wrong types at analysis") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    val out = df.select(VectorFunctions.dot_product(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    val bad = Seq(("x", 1)).toDF("a", "b")
    val err = intercept[Exception] {
      bad.select(VectorFunctions.dot_product(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("dot_product") ||
      err.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("dot_product registers for SQL via GraftExtensions") {
    // the injection wiring itself (what .withExtensions runs at build time)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // the shared test session predates extension install; register the same
    // builder directly to exercise the SQL path
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "dot_product",
        children => graft.functions.DotProduct(children(0), children(1)),
        "scala_udf")
    val r = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("OutcomeAggregator folds outcomes with map-side partials") {
    import spark.implicits._
    val ds = Seq(("ok", 1.0), ("error", 2.0), ("ok", 3.5)).toDS()
    val r = ds.select(OutcomeAggregator.outcomeStats.toColumn).head()
    assert(r.nOk == 2 && r.nError == 1 && math.abs(r.totalValue - 6.5) < 1e-9)
  }

  test("JaroWinkler matches the DuckDB-probed reference values at 6dp") {
    import spark.implicits._
    import org.apache.spark.sql.GraftColumnBridge
    // every row probed against DuckDB's jaro_winkler_similarity (the
    // oracle engine): published pairs, empties, and the boost-threshold
    // edge (jaro <= 0.7 suppresses the prefix bonus)
    val cases = Seq(
      ("martha", "marhta", 0.961111),
      ("dixon", "dicksonx", 0.813333),
      ("dwayne", "duane", 0.84),
      ("jellyfish", "smellyfish", 0.896296),
      ("prefixxx", "prefixyy", 0.9),
      ("abcdef", "fedcba", 0.388889),
      ("abcdxx", "abcdyy", 0.866667),
      ("abcdefgh", "abzzzzzz", 0.5), // prefix 2 but jaro <= 0.7: no boost
      ("abc", "abc", 1.0),
      ("a", "b", 0.0),
      ("abc", "", 0.0),
      ("", "", 0.0))
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(round(GraftColumnBridge.column(graft.functions.JaroWinkler(
        GraftColumnBridge.expression(col("a")),
        GraftColumnBridge.expression(col("b")))), 6).as("jw"))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b, want), jw) =>
      assert(jw == want, s"jw($a, $b) = $jw, want $want")
    }
  }

  test("JaroWinkler codegen and interpreted paths agree bit-for-bit") {
    import org.apache.spark.unsafe.types.UTF8String
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("prefixxx", "prefixyy"), ("abcdefgh", "abzzzzzz"), ("", "x"))
    pairs.foreach { case (a, b) =>
      // interpreted: the expression's nullSafeEval
      val interp = graft.functions.JaroWinkler(
        org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(a)),
        org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(b)))
        .eval(null).asInstanceOf[Double]
      // codegen: whole-stage over a DataFrame (the hot-path form)
      import spark.implicits._
      import org.apache.spark.sql.GraftColumnBridge
      val gen = Seq((a, b)).toDF("a", "b")
        .select(GraftColumnBridge.column(graft.functions.JaroWinkler(
          GraftColumnBridge.expression(col("a")),
          GraftColumnBridge.expression(col("b")))))
        .head().getDouble(0)
      assert(java.lang.Double.doubleToLongBits(interp) ==
        java.lang.Double.doubleToLongBits(gen), s"($a, $b)")
    }
  }

  test("JaroWinkler is null-safe and registers for SQL via GraftExtensions") {
    import spark.implicits._
    import org.apache.spark.sql.GraftColumnBridge
    val out = Seq((Some("abc"), Option.empty[String])).toDF("a", "b")
      .select(GraftColumnBridge.column(graft.functions.JaroWinkler(
        GraftColumnBridge.expression(col("a")),
        GraftColumnBridge.expression(col("b")))))
      .collect()
    assert(out(0).isNullAt(0))
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "jaro_winkler",
        children => graft.functions.JaroWinkler(children(0), children(1)),
        "scala_udf")
    val r = spark.sql("SELECT round(jaro_winkler('martha', 'marhta'), 6) AS j").head()
    assert(r.getDouble(0) == 0.961111)
  }
}
