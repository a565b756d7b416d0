package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key skew controls: salting for shuffle joins and for exact distinct
  * aggregation. On a low-cardinality or Zipf-skewed key, a hash shuffle sends
  * each key's entire volume to ONE reducer — at 100 TB the job runs at the
  * speed of the hottest key's partition. Salting splits every key into R
  * sub-keys deterministically, so the hot key's work spreads over R tasks,
  * at the cost of replicating the (small) build side R times.
  *
  * Relationship to AQE: `spark.sql.adaptive.skewJoin` re-splits oversized
  * partitions at runtime, but only for sort-merge joins and only per-join.
  * Plan-level salting is the explicit control that also covers hash
  * aggregation (no AQE equivalent) and keeps the plan shape predictable —
  * both belong in the toolbox; these operators are the explicit form, and
  * their oracle checks prove salting never changes results.
  *
  * Salts are DETERMINISTIC (pmod of a row key), never `rand()`: retried
  * tasks must re-emit identical salts or a retry under the shuffle's
  * at-least-once write protocol could mis-bucket rows (the same reasoning as
  * [[Pipeline]]'s hash-based sampling).
  */
object Skew {

  /** Salt fan-out, derived from the session: R ≈ parallelism/4 spreads each
    * hot key over a solid fraction of the cluster while bounding small-side
    * replication at R×. (At scale the ideal is hot-key volume / healthy
    * partition size; parallelism/4 is the right default when key volumes are
    * unknown — enough spread that no single reducer owns a whole hot key,
    * never more replication than the cluster can absorb.) Salting is
    * R-invariant in RESULTS — the oracles run unsalted — so deriving R from
    * the session changes plans, not answers.
    */
  def saltR(s: SparkSession): Int = math.max(2, s.sparkContext.defaultParallelism / 4)

  /** Shuffle join of a big skew-keyed side against a small (but not
    * broadcast-able) side: big rows get salt = pmod(rowKey, r); the small
    * side is replicated r times — join key becomes (key, salt), an equality
    * key with r× the cardinality. The `shuffle_hash` hint pins the
    * demonstration to a real shuffle join (a broadcast would make salting a
    * no-op — and when the small side DOES fit in memory, broadcast is the
    * better answer; salting is for when it doesn't).
    */
  def saltedJoin(big: DataFrame, rowKey: Column, small: DataFrame, key: String, r: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(rowKey, lit(r.toLong)).cast("int"))
    val replicated = small.withColumn("__salt", explode(sequence(lit(0), lit(r - 1))))
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Above-type-average events per type, with the fact-to-dim join salted:
    // events (5-value key — every row funnels to ≤5 reducers unsalted) join
    // per-type averages on (event_type, salt). The oracle runs the plain
    // unsalted join — hash-equality proves salting is semantically free.
    "sp_salted_join" -> { (s, dir) =>
      val e = Relational.t(s, dir, "events")
      val dim = e.groupBy("event_type")
        .agg((sum(Relational.dec(col("value"))).cast("double") / count(lit(1))).as("avg_value"))
      saltedJoin(e, col("event_id"), dim, "event_type", saltR(s))
        .filter(col("value") > col("avg_value"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_above"),
          Relational.dsum(col("value")).as("total_above"))
        .orderBy("event_type")
    },

    // Exact distinct users per event type via two-phase salted aggregation:
    // phase 1 groups on (event_type, salt) where salt = pmod(user_id, R) —
    // each DISTINCT user lands in exactly one salt bucket, so per-bucket
    // distinct counts add up exactly. Phase 2 sums the partials. The hot
    // type's distinct-set construction (the memory- and shuffle-heavy part
    // of exact distinct) runs on R tasks instead of one.
    "sp_salted_distinct" -> { (s, dir) =>
      Relational.t(s, dir, "events")
        .withColumn("__salt", pmod(col("user_id"), lit(saltR(s).toLong)).cast("int"))
        .groupBy("event_type", "__salt")
        .agg(countDistinct(col("user_id")).as("partial_users"))
        .groupBy("event_type")
        .agg(sum(col("partial_users")).as("n_users"))
        .orderBy("event_type")
    }
  )

  val oracles: Map[String, String] = Map(
    "sp_salted_join" ->
      """WITH dim AS (
        |  SELECT event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
        |  FROM events GROUP BY event_type
        |)
        |SELECT e.event_type, COUNT(*) AS n_above,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_above
        |FROM events e JOIN dim USING (event_type)
        |WHERE e.value > avg_value
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "sp_salted_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
