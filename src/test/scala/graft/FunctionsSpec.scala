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
}
