package graft.tasks

import graft.core.MapReduceTask
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The reference's one shipped user task (reference: `test/user_tasks.cc:12-34`,
  * registered as user `cs6210` at :49): tokenize each line on the delimiter set
  * `" ,."'"` and count occurrences of each token.
  *
  * Two implementations, cross-checked in tests:
  *  1. [[WordCount]] — the `MapReduceTask` form, running on the generic
  *     [[graft.core.MapReduceJob]] runtime (UDF path; opaque to Catalyst, exactly
  *     like the reference's virtual-call dispatch `src/worker.h:73,106`).
  *  2. [[WordCount.dataFrameQuery]] — the declarative form
  *     (`explode(split(...)) → groupBy.count`), which Catalyst compiles with
  *     map-side partial aggregation the reference lacks (`test/user_tasks.cc:19`
  *     ships one `(word, "1")` pair per occurrence). At scale the declarative form
  *     shuffles O(distinct words) instead of O(total words).
  */
object WordCount extends MapReduceTask {
  /** `strtok_r` on `" ,."'"` semantics: split on runs of delimiters, drop empties. */
  val DelimRegex = "[ ,.\"']+"

  def tokenize(line: String): Iterator[String] =
    line.split(DelimRegex).iterator.filter(_.nonEmpty)

  override def map(line: String): IterableOnce[(String, String)] =
    tokenize(line).map(w => (w, "1"))

  override def reduce(key: String, values: Iterator[String]): IterableOnce[(String, String)] = {
    var sum = 0L
    while (values.hasNext) sum += values.next().toLong
    Iterator.single((key, sum.toString))
  }

  /** Declarative equivalent over any single string column. */
  def dataFrameQuery(lines: DataFrame, textCol: String): DataFrame =
    lines
      .select(explode(split(col(textCol), DelimRegex)).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  def dataFrameQuery(lines: Dataset[String]): DataFrame =
    dataFrameQuery(lines.toDF("value"), "value")
}
