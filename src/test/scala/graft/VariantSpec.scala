package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Payload
import graft.operators.{AnalyticOps, EventOps}

/** The VARIANT payload path (`spark.graft.payload=variant`, see
  * [[graft.api.Payload]]): value parity with the default string path on
  * the driver tables, plus the single-parse plan property that is the
  * mode's whole point. The oracle gate never sees this mode (Verify
  * refuses it); this spec is its in-engine twin. */
class VariantSpec extends AnyFunSuite with SparkTest {

  private val probes: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] =
    Seq(
      "json_path_pack" -> (AnalyticOps.jsonPathPack _),
      "typed_payload" -> (AnalyticOps.typedPayload _),
      "event_decode" -> (EventOps.eventDecode _),
      "include_match" -> (EventOps.includeMatch _))

  test("variant payload mode returns the same VALUES as the string path for every JSON probe") {
    for ((name, fn) <- probes) {
      spark.conf.unset(Payload.ModeKey)
      val expected = fn(spark, sf).collect().map(_.toString).toSeq
      spark.conf.set(Payload.ModeKey, "variant")
      try {
        val got = fn(spark, sf).collect().map(_.toString).toSeq
        assert(got == expected, s"$name diverged under payload=variant")
        assert(got.nonEmpty, s"$name returned no rows")
      } finally spark.conf.unset(Payload.ModeKey)
    }
  }

  test("variant json_path_pack parses the payload ONCE (single parse_json, variant_get per field)") {
    spark.conf.set(Payload.ModeKey, "variant")
    try {
      val p = AnalyticOps.jsonPathPack(spark, sf).queryExecution.optimizedPlan.toString
      // parse_json renders as static_invoke(VariantExpressionEvalUtils.parseJson(..))
      val parses = "parsejson".r.findAllIn(p.toLowerCase).size
      assert(parses == 1, s"expected exactly one parseJson, got $parses:\n$p")
      assert(p.toLowerCase.contains("variant_get"), s"variant access missing:\n$p")
      // and the default path has NO variant anywhere
      spark.conf.unset(Payload.ModeKey)
      val q = AnalyticOps.jsonPathPack(spark, sf).queryExecution.optimizedPlan.toString
      assert(!q.toLowerCase.contains("variant"), s"default path must stay string-based:\n$q")
    } finally spark.conf.unset(Payload.ModeKey)
  }

  test("include_match pushes the variant probe into the filter, result still boolean-stable") {
    spark.conf.set(Payload.ModeKey, "variant")
    try {
      val got = EventOps.includeMatch(spark, sf).collect()
      assert(got.length == 1 && !got.head.isNullAt(0))
    } finally spark.conf.unset(Payload.ModeKey)
  }
}
