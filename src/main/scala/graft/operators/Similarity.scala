package graft.operators

import graft.functions.HashFunctions.md5Long
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding: array<float>`, `label`).
  *
  *  - [[queries ss_topk_bruteforce]] — exact cosine top-k for a query set,
  *    the correctness baseline. Deterministic via sequential left-fold dot
  *    products ([[Dedup.dotSeq]]) and vec_id tie-breaks → full DuckDB oracle.
  *  - [[queries ss_ann_lsh]] — the scale path: random-hyperplane LSH (signs of
  *    projections onto md5-derived pseudo-random hyperplanes) buckets vectors;
  *    candidates come from same-bucket joins only. Approximate ⇒ no SQL
  *    oracle (rows-only driver check); SimilaritySpec measures recall vs the
  *    brute-force baseline.
  *
  * Scale design (100 TB): brute force is O(queries × corpus) — fine for a
  * bounded query set, impossible corpus × corpus. The LSH path is
  * O(corpus × planes) for bucketing plus O(Σ bucket²) for candidate
  * generation; bucket width (number of hyperplanes) tunes the
  * recall/cost trade-off, and multiple independent tables raise recall
  * without quadratic blowup. Hyperplanes are derived deterministically from
  * md5, so results are reproducible across runs and engines.
  */
object Similarity {

  /** Number of query vectors (lowest vec_ids) for the top-k queries. */
  val NQueries = 10
  val TopK = 5

  /** Hyperplane LSH params: Tables × PlanesPerTable sign bits. Tuned for a
    * corpus with no planted clusters (neighbor cosines ~0.3-0.5): collision
    * probability per table (1-θ/π)^6 ≈ 0.05-0.15, so 12 independent tables
    * give useful recall while each table's 64 buckets still prune ~80% of the
    * corpus per query. With real clustered embeddings (near-dup cosine ≥ 0.9,
    * collision ~0.8 per table) the same structure gives recall ≈ 1 with far
    * stronger pruning.
    */
  val Tables = 12
  val PlanesPerTable = 6

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  def cosine(a: Column, b: Column): Column =
    Dedup.dotSeq(a, b) / (sqrt(Dedup.dotSeq(a, a)) * sqrt(Dedup.dotSeq(b, b)))

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * ((md5Long("p:<plane>:<dim>") mod 2000) - 1000) / 1000.
    */
  private def planeComponent(plane: Column, dim: Column): Column =
    ((md5Long(concat(lit("p:"), plane.cast("string"), lit(":"), dim.cast("string"))) % 2000L)
      .cast("double") - 1000.0) / 1000.0

  /** Sign bits of the projections of `v` onto `nPlanes` hyperplanes, packed
    * into a long. Plane indices are offset by `table * nPlanes`.
    */
  def lshKey(v: Column, table: Column, nPlanes: Int): Column = {
    val bits = transform(
      sequence(lit(0), lit(nPlanes - 1)),
      p => {
        val planeIdx = table * nPlanes + p
        val proj = aggregate(
          zip_with(
            v,
            sequence(lit(0), size(v) - 1),
            (x, d) => x * planeComponent(planeIdx, d)
          ),
          lit(0.0),
          (acc, x) => acc + x
        )
        when(proj >= 0, pow(lit(2.0), p).cast("long")).otherwise(lit(0L))
      }
    )
    aggregate(bits, lit(0L), (acc, b) => acc + b)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact top-k cosine neighbors for the NQueries lowest vec_ids.
    "ss_topk_bruteforce" -> { (s, dir) =>
      val e = vecs(s, dir)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val scored = q.join(e, col("query_id") =!= col("vec_id"))
        .select(
          col("query_id"),
          col("vec_id").as("neighbor_id"),
          cosine(col("qv"), col("v")).as("cos")
        )
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
      scored
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= TopK)
        .select("query_id", "rk", "neighbor_id", "cos")
        .orderBy("query_id", "rk")
    },

    // LSH-bucketed ANN: same output shape, approximate neighbor set.
    // Rows-only driver check; recall measured in SimilaritySpec.
    "ss_ann_lsh" -> { (s, dir) =>
      val e = vecs(s, dir)
      val tables = explode(sequence(lit(0), lit(Tables - 1)))
      val bucketed = e
        .withColumn("tbl", tables)
        .withColumn("bucket", lshKey(col("v"), col("tbl"), PlanesPerTable))
      val q = bucketed.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("tbl").as("q_tbl"), col("bucket").as("q_bucket"))
      val cands = q.join(
          bucketed,
          col("q_tbl") === col("tbl") && col("q_bucket") === col("bucket") &&
            col("query_id") =!= col("vec_id")
        )
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("qv"), col("v"))
        .distinct()
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
      cands
        .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("v")).as("cos"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= TopK)
        .select("query_id", "rk", "neighbor_id", "cos")
        .orderBy("query_id", "rk")
    }
  )

  val oracles: Map[String, String] = Map(
    "ss_topk_bruteforce" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
         |), scored AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |    list_reduce([q.v[i] * e.v[i] FOR i IN range(1, len(q.v)+1)], (p, s) -> p + s)
         |      / (sqrt(list_reduce([q.v[i] * q.v[i] FOR i IN range(1, len(q.v)+1)], (p, s) -> p + s))
         |         * sqrt(list_reduce([e.v[i] * e.v[i] FOR i IN range(1, len(e.v)+1)], (p, s) -> p + s))) AS cos
         |  FROM e q JOIN e ON q.vec_id < $NQueries AND q.vec_id <> e.vec_id
         |), ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk
         |  FROM scored
         |)
         |SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id, cos
         |FROM ranked WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin
    // ss_ann_lsh: intentionally no oracle (approximate); recall tested in ScalaTest.
  )
}
