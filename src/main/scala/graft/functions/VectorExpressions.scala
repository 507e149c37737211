package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector-similarity hot path
  * (SURVEY.md §7.2 "optional custom pieces"). The built-in composition
  * `aggregate(zip_with(a, b, _*_), 0D, _+_)` is a higher-order function —
  * interpreted per element, never codegen'd — which dominates brute-force
  * similarity scans. This expression emits a tight fused multiply-add
  * loop inside whole-stage codegen instead.
  *
  * The accumulation order (index 0 → n-1, one running double) is exactly
  * the fold order of the higher-order composition and of DuckDB's
  * `list_dot_product`, so oracle hash parity is preserved bit-for-bit.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects (array<double>, array<double>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      // strict, like DuckDB's list_dot_product — a silent min-length
      // truncation would return a plausible but wrong value
      throw new IllegalArgumentException(
        s"dot_product: array lengths differ ($n vs ${y.numElements()})")
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product: array lengths differ (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** All random-hyperplane LSH band buckets of a vector in ONE expression.
  *
  * The naive spelling — bands × bits literal plane arrays, each feeding
  * its own dot product — puts thousands of literal nodes in the plan
  * (analysis + constant folding take seconds on the driver) and compiles
  * one codegen loop per plane. This node carries only three ints; the
  * ±1 plane matrix is derived lazily per-JVM from the same md5-parity
  * rule the SQL oracle states (md5("plane:dim") first 4 hex digits odd →
  * +1), and a single fused loop nest computes every bucket.
  *
  * Bucket rule (bit-identical to the literal-plane spelling AND the
  * oracle): bucket(band) = Σ_bit [dot(v, plane(band·bits+bit)) > 0] ·
  * 2^bit, dots folded dim 0 → n-1 in double precision.
  *
  * Returns array<long> of length `bands` — callers posexplode into
  * (band_no, bucket).
  */
case class HyperplaneBuckets(child: Expression, bands: Int, bits: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_buckets expects array<double>, got ${other.catalogString}")
    }

  @transient private lazy val planes: Array[Array[Double]] =
    HyperplaneBuckets.planeMatrix(bands * bits, dim)

  private def compute(v: ArrayData): Array[Long] = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"hyperplane_buckets: expected dim $dim, got ${v.numElements()}")
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var bit = 0
      while (bit < bits) {
        val pl = planes(b * bits + bit)
        var dot = 0.0
        var d = 0
        while (d < dim) { dot += v.getDouble(d) * pl(d); d += 1 }
        if (dot > 0) acc |= (1L << bit)
        bit += 1
      }
      out(b) = acc
      b += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      compute(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val bit = ctx.freshName("bit")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val dot = ctx.freshName("dot")
      val pl = ctx.freshName("pl")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "hyperplane_buckets: expected dim $dim, got " + $v.numElements());
         |}
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $acc = 0L;
         |  for (int $bit = 0; $bit < $bits; $bit++) {
         |    double[] $pl = $planesRef[$b * $bits + $bit];
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $dot += $v.getDouble($d) * $pl[$d];
         |    }
         |    if ($dot > 0) $acc |= (1L << $bit);
         |  }
         |  $out[$b] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** Deterministic ±1 plane components, md5-seeded by (plane, dim): the
    * first 4 hex digits of md5("plane:dim") parsed as int, odd → +1.
    * Identical rule on the SQL-oracle side, so bucket assignments are
    * reproducible on any cluster. */
  def planeSign(pl: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$pl:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 4)
    if (Integer.parseInt(hex, 16) % 2 == 1) 1.0 else -1.0
  }

  def planeMatrix(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)(planeSign)
}

object VectorFunctions {
  /** Column API for [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API for [[HyperplaneBuckets]]. */
  def hyperplane_buckets(v: Column, bands: Int, bits: Int, dim: Int): Column =
    GraftColumnBridge.column(
      HyperplaneBuckets(GraftColumnBridge.expression(v), bands, bits, dim))
}
