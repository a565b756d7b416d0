package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Bit-exactness of [[Maintenance.mortonZ]] (the interleave
  * [[Maintenance.zOrderBy]] sorts by): de-interleaving the z-value recovers
  * both normalized coordinates, and the curve preserves quadrant ordering
  * (the property file-level min/max pruning relies on). Calls the SHARED
  * production expression — the only bit-math twin here is the trivial
  * de-interleaver.
  */
object ZOrderProperties extends Properties("ZOrderMorton") {

  private lazy val spark = graft.SparkSpec.session
  private val coord = Gen.choose(0L, 65535L)

  private def z(x: Long, y: Long): Long = {
    import org.apache.spark.sql.functions.lit
    spark.range(1).select(Maintenance.mortonZ(lit(x), lit(y)).as("z")).head().getLong(0)
  }

  private def deinterleave(zv: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    (0 until 16).foreach { i =>
      x |= ((zv >> (2 * i)) & 1L) << i
      y |= ((zv >> (2 * i + 1)) & 1L) << i
    }
    (x, y)
  }

  property("de-interleaving the z-value recovers both coordinates") =
    forAll(coord, coord) { (x, y) => deinterleave(z(x, y)) == ((x, y)) }

  private val lo = Gen.choose(0L, 32767L)
  private val hi = Gen.choose(32768L, 65535L)

  property("quadrant ordering: high-bit splits dominate the curve order") =
    forAll(lo, lo, hi, hi) { (x1, y1, x2, y2) =>
      // Both coordinates of p1 in strictly lower halves than p2's ⇒ p1
      // precedes p2 on the curve (what makes file ranges rectangles).
      z(x1, y1) < z(x2, y2)
    }
}
