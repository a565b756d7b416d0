package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (the MOSS local fingerprinting scheme,
  * Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every k-gram of the token
  * stream, slide a window of `w` consecutive hashes, keep each window's
  * MINIMUM hash, output the distinct selected hashes in ascending order.
  *
  * Guarantee: any two documents sharing a token run of length ≥ w + k − 1
  * share at least one fingerprint (every length-w hash window inside the run
  * selects from the run), while only ~2/(w+1) of all gram hashes are kept —
  * position-local dedup/provenance signatures at a fraction of the full
  * gram-set cost, and unlike MinHash they localize WHERE the overlap is.
  *
  * Cross-engine determinism: tokenization matches [[ShingleSet]] (lowercase,
  * space-run split, Locale.ROOT), the gram hash is the 60-bit md5 prefix
  * ([[Md5Long]] ≡ DuckDB `CAST('0x'||substr(md5(g),1,15) AS BIGint)`), and
  * the window minimum is a pure value-min (ties in VALUE are identical
  * hashes, so the classic rightmost-tie rule cannot change the selected
  * SET). Fewer than w windows ⇒ one global min; fewer than k tokens ⇒ empty.
  * One JVM call per row (CodegenFallback), like [[ShingleSet]].
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(k >= 1 && w >= 1, s"k and w must be positive (got k=$k, w=$w)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(StringType)

  private def md5Long60(s: String): Long = {
    val md = Winnow.digests.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var out = 0L
    var i = 0
    while (i < 8) { out = (out << 8) | (d(i) & 0xffL); i += 1 }
    out >>> 4
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).split(" +").filter(_.nonEmpty)
    val m = toks.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      hs(i) = md5Long60(sb.toString)
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (m < w) {
      var mn = hs(0)
      var t = 1
      while (t < m) { if (hs(t) < mn) mn = hs(t); t += 1 }
      selected.add(mn)
    } else {
      // O(m·w) scan: w is a small constant (8 here); a deque-based O(m)
      // sliding min buys nothing at this window size.
      var s = 0
      while (s <= m - w) {
        var mn = hs(s)
        var t = s + 1
        while (t < s + w) { if (hs(t) < mn) mn = hs(t); t += 1 }
        selected.add(mn)
        s += 1
      }
    }
    val out = new Array[Any](selected.size())
    val it = selected.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next().longValue(); idx += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Winnow = copy(child = newChild)
}

object Winnow {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def apply(c: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(Winnow(GraftSqlBridge.expression(c), k, w))
}
