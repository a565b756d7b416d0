package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped stored-structure tier (shared by the ANN indexes in
  * [[graft.operators.Similarity]] and the BPE merge table in
  * [[graft.operators.BpeTrainer]]): materialize a trained/derived structure
  * to parquet ONCE per (structure, dataset dir) and read it back — the
  * production shape, where codebooks, centroids, and tokenizers are built
  * offline once and STORED; every query (and every repeat invocation in
  * this JVM) reads the stored artifact.
  *
  * The build thunk is by-name so a cache hit constructs no training plan at
  * all (plan construction itself was the LSH planning cliff). Keyed by
  * dataset dir so scale factors never share a structure; session-scoped via
  * the JVM map — a new process retrains, exactly like a cold index build.
  */
object Stored {
  private val stored = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def materialize(name: String, dir: String, s: SparkSession)(df: => DataFrame): DataFrame = {
    val path = stored.computeIfAbsent(s"$name:$dir", { _ =>
      val p = graft.operators.Connectors.tmp(name)
      df.write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }
}
