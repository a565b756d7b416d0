package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden vectors for the RepetitionStats expression (the `ta_repetition`
  * query additionally hash-matches the full DuckDB oracle on the gate).
  */
class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String, n: Int = 3): (Long, Long, Long) = {
    val r = Seq(text).toDF("t")
      .select(RepetitionStats(col("t"), n).as("r"))
      .select("r.total_grams", "r.distinct_grams", "r.top_count")
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("counts total, distinct, and dominant 3-gram occurrences") {
    // grams: "a b a", "b a b", "a b a", "b a b"
    assert(stats("a b a b a b") == ((4L, 2L, 2L)))
    // all-identical tokens: every gram is "w w w"
    assert(stats("w w w w w") == ((3L, 1L, 3L)))
    // no repetition at all
    assert(stats("one two three four") == ((2L, 2L, 1L)))
  }

  test("tokenization contract: lowercase, space runs, edge empties") {
    // "The  THE the x" -> [the, the, the, x]: "the the the", "the the x"
    assert(stats("  The  THE the x ") == ((2L, 2L, 1L)))
  }

  test("fewer than n tokens yields (0,0,0), the caller's filter sentinel") {
    assert(stats("a b") == ((0L, 0L, 0L)))
    assert(stats("") == ((0L, 0L, 0L)))
    assert(stats("   ") == ((0L, 0L, 0L)))
  }
}
