package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for [[RepetitionStats]] against a naive reference
  * implementation (sliding + groupBy) over random token streams — pure JVM
  * expression eval, no Spark session. The small alphabet forces heavy
  * repetition so the counting path (not just the degenerate all-distinct
  * case) is exercised.
  */
object RepetitionStatsProperties extends Properties("RepetitionStats") {

  private val token = Gen.oneOf("a", "b", "c", "ab", "Xy")
  private val text = for {
    toks <- Gen.listOf(token)
    seps <- Gen.listOfN(toks.length + 1, Gen.oneOf(" ", "  ", ""))
  } yield seps.head + toks.zip(seps.tail).map { case (t, s) => t + s }.mkString

  private def eval(t: String, n: Int): (Long, Long, Long) = {
    val r = RepetitionStats(
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(t)), n)
      .eval(InternalRow.empty).asInstanceOf[InternalRow]
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def naive(t: String, n: Int): (Long, Long, Long) = {
    val toks = t.toLowerCase(java.util.Locale.ROOT).split(" +").filter(_.nonEmpty).toSeq
    if (toks.length < n) (0L, 0L, 0L)
    else {
      val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size.toLong)
      (grams.size.toLong, counts.size.toLong, counts.values.max)
    }
  }

  property("matches the naive sliding+groupBy reference") =
    forAll(text, Gen.choose(1, 4)) { (t, n) => eval(t, n) == naive(t, n) }

  property("invariants: distinct <= total, top*distinct >= total, top <= total") =
    forAll(text) { t =>
      val (total, distinct, top) = eval(t, 3)
      distinct <= total && top <= total && (total == 0L || top * distinct >= total)
    }
}
