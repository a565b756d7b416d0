package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic hashing used by the dedup / similarity operators.
  *
  * Two tiers:
  *
  *  1. [[HashFunctions.md5Long]] — a 60-bit hash derived from `md5` that is
  *     '''reproducible in any SQL engine''' (`conv(substring(md5(x),1,15),16,10)`
  *     ≡ DuckDB `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`). MinHash/SimHash
  *     signatures built from it are therefore oracle-checkable end-to-end.
  *     15 hex chars = 60 bits, always non-negative in a signed 64-bit long.
  *
  *  2. [[Fnv64]] — a native Catalyst expression (with whole-stage codegen) for
  *     FNV-1a 64-bit over a string's UTF-8 bytes: the engine-internal fast
  *     fingerprint path. ~10× cheaper than md5 per call; used where cross-engine
  *     reproducibility is not required.
  */
object HashFunctions {

  /** Cross-engine 60-bit hash of a string column, optionally seeded.
    * DuckDB equivalent: `CAST('0x' || substr(md5(<seed> || ':' || x), 1, 15) AS BIGINT)`.
    * Computed natively from the digest bytes (first 15 hex chars ≡ big-endian
    * first 8 bytes >>> 4) — the `conv(substring(md5(...)))` SQL formulation
    * allocates a hex string and parses it per call, which dominated the
    * signature-computation stages.
    */
  def md5Long(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(Md5Long(GraftSqlBridge.expression(c)))
  }

  def md5Long(seed: Int, c: Column): Column =
    md5Long(concat(lit(seed.toString), lit(":"), c))

  /** FNV-1a 64 as a Column (Spark 4 classic-API bridge Column ↔ Expression). */
  def fnv64(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(Fnv64(GraftSqlBridge.expression(c)))
  }

  /** Reference implementation (FNV-1a 64, public-domain constants). */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    for (b <- s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) {
      h ^= (b & 0xffL)
      h *= 0x100000001b3L
    }
    h
  }
}

/** The 60-bit md5-derived hash as a native expression: value of the first 15
  * hex chars of md5 ≡ (big-endian long of digest bytes 0..7) >>> 4. Always
  * non-negative. Thread-local digest instance; CodegenFallback costs one
  * virtual call per row, irrelevant at row granularity.
  */
case class Md5Long(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any = {
    val md = Md5Long.digests.get()
    md.reset()
    val d = md.digest(v.asInstanceOf[UTF8String].getBytes)
    var out = 0L
    var i = 0
    while (i < 8) { out = (out << 8) | (d(i) & 0xffL); i += 1 }
    out >>> 4
  }
  override protected def withNewChildInternal(newChild: Expression): Md5Long = copy(child = newChild)
}

object Md5Long {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** FNV-1a 64-bit hash of a string, as a codegen-capable Catalyst expression.
  * Stays inside WholeStageCodegen (no UDF serialization, no boxing on the hot
  * path) — preference order (b) from the build guide: a native `Expression`
  * beats a Scala UDF.
  */
case class Fnv64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h ^= ($bytes[$i] & 0xffL);
         |  $h *= 0x100000001b3L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Fnv64 = copy(child = newChild)
}
