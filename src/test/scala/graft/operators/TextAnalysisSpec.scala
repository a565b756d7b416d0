package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("readability: counts match hand-computed values on known texts; score tree exact") {
    val rows = TextAnalysis.queries("ta_readability")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val texts = Relational.t(spark, sf(), "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val t = texts(r.getLong(0))
      val words = t.toLowerCase(java.util.Locale.ROOT).split(" +").count(_.nonEmpty)
      val sentences = math.max("[.!?]+".r.findAllIn(t).size, 1)
      val syllables = math.max("[aeiouy]+".r.findAllIn(t.toLowerCase(java.util.Locale.ROOT)).size, 1)
      assert(r.getInt(1) == words, s"words for doc ${r.getLong(0)}")
      assert(r.getInt(2) == sentences, s"sentences for doc ${r.getLong(0)}")
      assert(r.getInt(3) == syllables, s"syllables for doc ${r.getLong(0)}")
      val flesch = 206.835 -
        1.015 * (words.toDouble / sentences.toDouble) -
        84.6 * (syllables.toDouble / words.toDouble)
      assert(r.getDouble(4) == flesch, s"score for doc ${r.getLong(0)}")
    }
  }
}
