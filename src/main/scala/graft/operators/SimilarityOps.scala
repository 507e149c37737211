package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Similarity search over the `embeddings` table (north-star extension —
  * SURVEY.md §2.3): brute-force cosine top-k as the correctness baseline,
  * random-hyperplane LSH and an IVF-style coarse index as the 100 TB
  * paths.
  *
  * All dot products fold left-to-right over the array
  * (`aggregate(zip_with(...))`) in double precision, matching DuckDB's
  * `list_dot_product` element order, so cosines agree bit-for-bit with the
  * oracle before the defensive round(…, 6).
  *
  * Sign decisions (LSH bits, IVF assignment) never compare raw
  * nondeterministically-summed doubles: the fold order is fixed, and ties
  * break on ids.
  */
object SimilarityOps {

  /** Embeddings with the float vector cast to double once. */
  private def vecs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))

  /** Sequential-fold dot product of two array<double> columns — the
    * custom codegen'd expression (graft.functions.DotProduct); same fold
    * order as `aggregate(zip_with(...))` and DuckDB's list_dot_product,
    * so results are bit-identical, just inside whole-stage codegen. */
  private def dot(a: String, b: String): Column =
    graft.functions.VectorFunctions.dot_product(col(a), col(b))

  private def cosine(a: String, b: String): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Vector norms + dimension — embedding sanity stats. */
  def embedNorms(spark: SparkSession, sfDir: String): DataFrame =
    vecs(spark, sfDir).select(
      col("vec_id"),
      size(col("v")).as("dim"),
      round(sqrt(dot("v", "v")), 6).as("l2_norm"))
      .orderBy("vec_id")

  /** Brute-force cosine top-k (k=10) against a probe vector (vec_id 0):
    * the correctness baseline for ANN. The one-row probe side is
    * broadcast; the scan side streams — no shuffle at all. */
  def topkSimilarity(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    val probe = e.filter(col("vec_id") === 0).select(col("v").as("p"))
    e.crossJoin(broadcast(probe))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), round(cosine("v", "p"), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** Exact near-duplicate pairs (cosine ≥ 0.4) with cheap blocking on
    * `label` — the O(n²/blocks) exact path; the LSH variant below is the
    * scale path. */
  def embeddingNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    // pre-normalize once per vector (norm hoisted to its own projection),
    // so each pair costs a single dot product instead of three
    val unit = vecs(spark, sfDir)
      .select(col("vec_id"), col("label"), col("v"), sqrt(dot("v", "v")).as("nrm"))
      .select(col("vec_id"), col("label"),
        expr("transform(v, x -> x / nrm)").as("u"))
    val a = unit.select(col("vec_id").as("vec_a"), col("label").as("la"), col("u").as("ua"))
    val b = unit.select(col("vec_id").as("vec_b"), col("label").as("lb"), col("u").as("ub"))
    a.join(b, col("la") === col("lb") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), round(dot("ua", "ub"), 6).as("cos"))
      .filter(col("cos") >= 0.4)
      .orderBy("vec_a", "vec_b")
  }

  /** Deterministic pseudo-random ±1 hyperplane components: md5-seeded by
    * (plane, dim) — reproducible on any cluster AND in the SQL oracle
    * (same md5-parity rule stated in both). */
  private def planeSign(pl: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$pl:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 4)
    if (Integer.parseInt(hex, 16) % 2 == 1) 1.0 else -1.0
  }

  /** Random-hyperplane LSH ANN: 6-bit signatures bucket the vectors; the
    * probe searches only its own bucket, then re-ranks exactly. At 100 TB
    * the signature is computed in ONE scan — the 6 planes are constant
    * literal vectors, so each bit is a codegen dot product in the
    * projection (no explode, no join, no shuffle); candidates then come
    * from a bucket equi-join. Sign decisions are deterministic because
    * the dot-product fold order is fixed. */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val nPlanes = 6
    val e = vecs(spark, sfDir)
    val bucketCol = (0 until nPlanes).map { p =>
      val plane = array((0 until 64).map(d => lit(planeSign(p, d))): _*)
      when(graft.functions.VectorFunctions.dot_product(col("v"), plane) > 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val sig = e.select(col("vec_id"), bucketCol.cast("long").as("bucket"))
    val probeBucket = sig.filter(col("vec_id") === 0).select(col("bucket").as("pb"))
    val probeVec = e.filter(col("vec_id") === 0).select(col("v").as("p"))
    sig.join(broadcast(probeBucket), col("bucket") === col("pb"))
      .filter(col("vec_id") =!= 0)
      .join(e, Seq("vec_id"))
      .crossJoin(broadcast(probeVec))
      .select(col("vec_id"), col("bucket"), round(cosine("v", "p"), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(5)
  }

  /** IVF-style coarse quantization with deterministic centroids (the
    * first 8 vectors): assign every vector to its nearest centroid
    * (broadcast centroids — one scan, no shuffle of the big side), probe
    * the 2 nearest lists, re-rank exactly. The deterministic seeding
    * stands in for k-means; the partition/probe shape is the 100 TB one.
    */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cid"),
        round(cosine("v", "cv"), 6).as("ccos"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cid"))
    // probe-list selection needs only the probe vector vs the centroids —
    // computing it from `assigned` would run the full-table assignment
    // pass a second time
    val probeLists = e.filter(col("vec_id") === 0)
      .select(col("v").as("p"))
      .crossJoin(broadcast(cents))
      .select(col("cid"), round(cosine("p", "cv"), 6).as("pcos"))
      .orderBy(col("pcos").desc, col("cid"))
      .limit(2)
      .select(col("cid").as("probe_cid"))
    val probeVec = e.filter(col("vec_id") === 0).select(col("v").as("p"))
    assigned
      .join(broadcast(probeLists), col("cid") === col("probe_cid"))
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probeVec))
      .select(col("vec_id"), col("cid"), round(cosine("v", "p"), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(5)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_norms"       -> (embedNorms _),
    "topk_similarity"   -> (topkSimilarity _),
    "embedding_neardup" -> (embeddingNeardup _),
    "ann_lsh"           -> (annLsh _),
    "ann_ivf"           -> (annIvf _))

  private val vSql = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  val oracles: Map[String, String] = Map(
    "embed_norms" ->
      s"""WITH v AS (SELECT vec_id, $vSql AS v FROM embeddings)
        |SELECT vec_id, array_length(v) AS dim,
        | round(sqrt(list_dot_product(v, v)), 6) AS l2_norm
        |FROM v ORDER BY vec_id""".stripMargin,
    "topk_similarity" ->
      s"""WITH v AS (SELECT vec_id, $vSql AS v FROM embeddings),
        |p AS (SELECT v AS pv FROM v WHERE vec_id = 0)
        |SELECT vec_id, round(${cosSql("v", "pv")}, 6) AS cos
        |FROM v, p WHERE vec_id <> 0
        |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
    "embedding_neardup" ->
      s"""WITH v AS (SELECT vec_id, label, $vSql AS v FROM embeddings),
        |nv AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
        |u AS (SELECT vec_id, label, list_transform(v, x -> x / nrm) AS u FROM nv)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        | round(list_dot_product(a.u, b.u), 6) AS cos
        |FROM u a JOIN u b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.u, b.u), 6) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    "ann_lsh" ->
      s"""WITH v AS (SELECT vec_id, $vSql AS v FROM embeddings),
        |pl AS (
        | SELECT p.pl, dd.d,
        |  CASE WHEN CAST('0x' || substr(md5(CAST(p.pl AS VARCHAR) || ':' || CAST(dd.d AS VARCHAR)), 1, 4) AS INTEGER) % 2 = 1
        |   THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END AS s
        | FROM (SELECT unnest(generate_series(0, 5)) AS pl) p,
        |      (SELECT unnest(generate_series(0, 63)) AS d) dd),
        |planevecs AS (SELECT pl, list(s ORDER BY d) AS pvec FROM pl GROUP BY pl),
        |sig AS (
        | SELECT vec_id,
        |  CAST(sum(CASE WHEN list_dot_product(v, pvec) > 0 THEN CAST(pow(2, pl) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
        | FROM v, planevecs GROUP BY vec_id),
        |pb AS (SELECT bucket AS probe_bucket FROM sig WHERE vec_id = 0),
        |pv AS (SELECT v AS p FROM v WHERE vec_id = 0)
        |SELECT s.vec_id, s.bucket, round(${cosSql("v.v", "pv.p")}, 6) AS cos
        |FROM sig s JOIN pb ON s.bucket = pb.probe_bucket
        | JOIN v ON v.vec_id = s.vec_id, pv
        |WHERE s.vec_id <> 0
        |ORDER BY cos DESC, s.vec_id LIMIT 5""".stripMargin,
    "ann_ivf" ->
      s"""WITH v AS (SELECT vec_id, $vSql AS v FROM embeddings),
        |cents AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id < 8),
        |assigned AS (
        | SELECT vec_id, v, cid FROM (
        |  SELECT v.vec_id, v.v, c.cid,
        |   row_number() OVER (PARTITION BY v.vec_id
        |     ORDER BY round(${cosSql("v.v", "c.cv")}, 6) DESC, c.cid) AS rn
        |  FROM v, cents c) t WHERE rn = 1),
        |probe_lists AS (
        | SELECT c.cid AS probe_cid
        | FROM (SELECT v FROM assigned WHERE vec_id = 0) p, cents c
        | ORDER BY round(${cosSql("p.v", "c.cv")}, 6) DESC, c.cid LIMIT 2),
        |pv AS (SELECT v AS p FROM v WHERE vec_id = 0)
        |SELECT a.vec_id, a.cid, round(${cosSql("a.v", "pv.p")}, 6) AS cos
        |FROM assigned a JOIN probe_lists ON a.cid = probe_cid, pv
        |WHERE a.vec_id <> 0
        |ORDER BY cos DESC, a.vec_id LIMIT 5""".stripMargin)
}
