package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared ScalaTest base: one local SparkSession shared across suites,
  * recreated on demand if a suite (FailureRecoverySpec) tore it down to run
  * with a different master. Test execution is sequential (single forked JVM),
  * so swap-and-restore is safe.
  */
trait SparkSpec extends AnyFunSuite {
  // Stable identifier (for `import spark.implicits._`), initialized at the
  // suite's first use — safe because suites run sequentially, so a session
  // swap by FailureRecoverySpec can't race a sibling suite's initialization.
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}

object SparkSpec {
  private var _session: SparkSession = _

  def session: SparkSession = synchronized {
    if (_session == null || _session.sparkContext.isStopped) {
      _session = SparkSession
        .builder()
        .master("local[8]")
        .appName("graft-test")
        .withExtensions(new graft.plans.GraftExtensions)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        // Mirror EngineSession's codegen-cache sizing (static conf — the
        // FIRST session in a JVM fixes it for the whole process, and the
        // 340-test suite churns far more generated classes than 100
        // entries hold). PlanAuditSpec pins the active value.
        .config("spark.sql.codegen.cache.maxEntries", graft.EngineSession.CodegenCacheEntries)
        // Mirror EngineSession's sort-based shuffle writer (r20): the
        // shuffle manager reads this from the CONTEXT conf, and the first
        // context in the JVM is process-wide — without the mirror, suites
        // would exercise the bypass-merge writer the engine never runs.
        .config("spark.shuffle.sort.bypassMergeThreshold", "0")
        .getOrCreate()
      _session.sparkContext.setLogLevel("WARN")
    }
    _session
  }

  /** Stop the shared session (if any) so a suite can build one with a
    * different master; the next `session` call recreates the shared one.
    */
  def reset(): Unit = synchronized {
    if (_session != null && !_session.sparkContext.isStopped) _session.stop()
    _session = null
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }
}
