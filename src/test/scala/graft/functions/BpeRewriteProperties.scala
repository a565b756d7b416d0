package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property proofs for the two equivalence arguments the round-7 oracles
  * rest on:
  *
  *  1. The DuckDB BPE-merge oracle rewrites with a list_reduce FOLD (merge
  *     when the accumulator's last symbol is `a` and the incoming is `b`),
  *     while the engine scans left-to-right non-overlapping
  *     ([[BpeMerge.rewrite]]). The doc argument: a merged token `ab` can
  *     never equal `a` (symbols non-empty), so the fold consumes exactly
  *     the scan's positions. Verified here over random symbol streams from
  *     a tiny alphabet (maximizing adjacent collisions, including a == b).
  *
  *  2. The prefix bound ⌈(num/den)·n⌉ computed as (n·num + den−1) div den
  *     (Dedup.prefixLenCol) equals the real ceiling for every n — the pure
  *     integer form the float `ceil(0.9·n)` was replaced by.
  */
object BpeRewriteProperties extends Properties("BpeRewrite") {

  private val sym = Gen.oneOf("x", "y", "z", "xy")
  private val syms = Gen.listOfN(12, sym)
  private val pair = for { a <- sym; b <- sym } yield (a, b)

  /** The oracle's fold, transliterated from the list_reduce lambda. */
  private def foldRewrite(in: List[String], a: String, b: String): List[String] =
    in.foldLeft(List.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }

  property("fold rewrite == left-to-right non-overlapping scan") =
    forAll(syms, pair) { (s, ab) =>
      val (a, b) = ab
      val scan = BpeMerge
        .rewrite(s.map(UTF8String.fromString).toArray,
          UTF8String.fromString(a), UTF8String.fromString(b))
        .map(_.toString).toList
      scan == foldRewrite(s, a, b)
    }

  property("integer prefix bound equals the exact ceiling for 9/10 and 4/5") =
    forAll(Gen.choose(1, 100000)) { n =>
      def intCeil(num: Int, den: Int): Long = (n.toLong * num + den - 1) / den
      def realCeil(num: Int, den: Int): Long =
        (BigDecimal(n) * num / den)
          .setScale(0, BigDecimal.RoundingMode.CEILING).toLong
      intCeil(9, 10) == realCeil(9, 10) && intCeil(4, 5) == realCeil(4, 5)
    }
}
