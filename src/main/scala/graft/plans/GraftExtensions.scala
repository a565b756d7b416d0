package graft.plans

import graft.functions.{Fnv64, Md5Long, SeqDot, ShingleSet}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT graft_md5long(text)...")`
  * works and the functions are usable from pure-SQL deployments.
  *
  * Activate with:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)            // programmatic, or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (FunctionIdentifier("graft_fnv64"),
        info("graft_fnv64", "graft_fnv64(str) - FNV-1a 64-bit hash of str's UTF-8 bytes."),
        (args: Seq[Expression]) => Fnv64(args.head))
    )
    e.injectFunction(
      (FunctionIdentifier("graft_md5long"),
        info("graft_md5long", "graft_md5long(str) - 60-bit md5-derived cross-engine hash."),
        (args: Seq[Expression]) => Md5Long(args.head))
    )
    e.injectFunction(
      (FunctionIdentifier("graft_seqdot"),
        info("graft_seqdot", "graft_seqdot(a, b) - sequential left-fold dot product of two double arrays."),
        (args: Seq[Expression]) => SeqDot(args(0), args(1)))
    )
    e.injectFunction(
      (FunctionIdentifier("graft_shingles"),
        info("graft_shingles", "graft_shingles(text, n) - distinct word n-gram shingles of text."),
        (args: Seq[Expression]) => args match {
          case Seq(c) => ShingleSet(c, 3)
          case Seq(c, n) =>
            // n parameterizes the expression itself, so it must be a constant:
            // demand foldability and an integral type up front — a column or a
            // fractional literal should fail at analysis, not as a runtime
            // ClassCastException mid-job.
            if (!n.foldable)
              throw new IllegalArgumentException(
                "graft_shingles(text, n): n must be a foldable integer literal")
            n.eval() match {
              case i: Int                              => ShingleSet(c, i)
              case l: Long if l == l.toInt.toLong      => ShingleSet(c, l.toInt)
              case s: Short                            => ShingleSet(c, s.toInt)
              case b: Byte                             => ShingleSet(c, b.toInt)
              case other =>
                throw new IllegalArgumentException(
                  s"graft_shingles(text, n): n must be an integer literal, got $other")
            }
          case _ =>
            throw new IllegalArgumentException(
              "graft_shingles expects (text) or (text, n)")
        })
    )
  }
}
