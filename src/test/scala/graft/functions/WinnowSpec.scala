package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fps(text: String, k: Int = 4, w: Int = 8): Seq[Long] =
    Seq(text).toDF("text")
      .select(Winnow(col("text"), k, w).as("fp"))
      .head().getSeq[Long](0)

  test("selected fingerprints are a subset of the gram hashes, sorted distinct ascending") {
    val text = (1 to 40).map(i => s"tok${i % 13}").mkString(" ")
    val toks = text.split(" ")
    val grams = toks.sliding(4).map(_.mkString(" ")).toSeq
    val gramHashes = Seq(grams: _*).toDF("g")
      .select(HashFunctions.md5Long(col("g"))).collect().map(_.getLong(0)).toSet
    val got = fps(text)
    assert(got.nonEmpty && got.toSet.subsetOf(gramHashes))
    assert(got == got.distinct.sorted, "output must be sorted distinct")
    // Winnowing keeps ~2/(w+1) of hashes: far fewer than all of them.
    assert(got.size < gramHashes.size)
  }

  test("two documents sharing a run of >= w+k-1 tokens share a fingerprint") {
    // 11 shared tokens (= 8+4-1) embedded in otherwise-disjoint text.
    val run = (1 to 11).map(i => s"shared$i").mkString(" ")
    val a = s"alpha beta gamma delta $run epsilon zeta"
    val b = s"one two three $run four five six seven"
    assert(fps(a).toSet.intersect(fps(b).toSet).nonEmpty, "winnowing guarantee violated")
  }

  test("degenerate inputs: fewer than k tokens yields empty; short docs yield the global min") {
    assert(fps("a b c").isEmpty)
    // 5 tokens -> 2 grams -> fewer than w windows -> exactly one fingerprint.
    val got = fps("a b c d e")
    assert(got.size == 1)
  }
}
