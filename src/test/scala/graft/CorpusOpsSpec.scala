package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusOps, TextOps}

/** Semantic assertions for the corpus-statistics / mixture family.
  * The DuckDB oracle gates exact values; these tests pin the invariants
  * that make the answers MEANINGFUL (ordering, bounds, budget
  * semantics, bloom-prefilter transparency) against the smallest SF. */
class CorpusOpsSpec extends AnyFunSuite with SparkTest {

  test("vocab_topk is count-ordered, df-bounded, and complete for a tiny vocab") {
    val rows = CorpusOps.vocabTopk(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.sameElements(cnts.sortBy(-_)), "not ordered by cnt desc")
    rows.foreach { r =>
      val (cnt, df) = (r.getAs[Long]("cnt"), r.getAs[Long]("df"))
      assert(df >= 1 && df <= cnt, s"df $df outside [1, cnt=$cnt]")
    }
    // every token the corpus contains is in the table when |vocab| ≤ k
    val distinctTokens = graft.model.Tables.documents(spark, sf)
      .select(explode(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")).as("t"))
      .distinct().count()
    if (distinctTokens <= 100) assert(rows.length == distinctTokens)
  }

  test("bigram_counts honors the cutoff and the (cnt desc, bigram) order") {
    val rows = CorpusOps.bigramCounts(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("cnt") >= 10))
    val key = rows.map(r => (-r.getAs[Long]("cnt"), r.getAs[String]("bigram")))
    assert(key.sameElements(key.sorted), "not ordered by (cnt desc, bigram)")
  }

  test("passage_dedup: ratios bounded, one row per doc, exact clones fully duplicated") {
    val out = CorpusOps.passageDedup(spark, sf).cache()
    val docs = graft.model.Tables.documents(spark, sf)
    assert(out.count() == docs.count())
    assert(out.filter(col("n_dup") > col("n_pass") ||
      col("dup_ratio") < 0 || col("dup_ratio") > 1).count() == 0)
    // docs sharing identical text must have every passage duplicated
    val clones = docs.groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("doc_id"))
    val cloneRows = out.join(clones, Seq("doc_id"))
    if (cloneRows.count() > 0)
      assert(cloneRows.filter(col("dup_ratio") < 1.0).count() == 0,
        "an exact clone has a non-duplicated passage")
    out.unpersist()
  }

  test("source_mix keeps at least one doc per source and never exceeds budget+1 doc") {
    val docs = graft.model.Tables.documents(spark, sf)
    val maxDocTokens = docs
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n")).agg(max(col("n")))
      .head().getLong(0)
    val rows = CorpusOps.sourceMix(spark, sf).collect()
    val nSources = docs.select(col("source")).distinct().count()
    assert(rows.length == nSources, "a source lost all its documents")
    rows.foreach { r =>
      val kept = r.getAs[Long]("n_tokens_kept")
      assert(r.getAs[Long]("n_docs") >= 1)
      // admit-while-below semantics can overshoot by at most one document
      assert(kept < 2500L + maxDocTokens,
        s"source ${r.getAs[String]("source")} kept $kept tokens")
    }
  }

  test("decontaminate_bloom is bit-identical to the exact path") {
    val exact = TextOps.decontaminate(spark, sf).collect().toSeq
    val bloom = TextOps.decontaminateBloom(spark, sf).collect().toSeq
    assert(bloom == exact)
  }
}
