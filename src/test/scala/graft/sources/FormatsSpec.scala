package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class FormatsSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("CSV round-trip preserves the customer table exactly") {
    val src = Tables.t(spark, sf(), "customer")
    val dir = Files.createTempDirectory("csv-rt").toString
    Formats.writeCsv(src, dir)
    val back = Formats.readCsv(spark, dir, src.schema)
    assert(back.schema == src.schema)
    assert(canon(back) == canon(src))
  }

  test("JSON round-trip preserves the orders table (timestamps included)") {
    val src = Tables.t(spark, sf(), "orders")
    val dir = Files.createTempDirectory("json-rt").toString
    Formats.writeJson(src, dir)
    val back = Formats.readJson(spark, dir, src.schema)
    assert(back.schema == src.schema)
    assert(canon(back) == canon(src))
  }

  test("JSON round-trip preserves the embeddings array column") {
    val src = Tables.t(spark, sf(), "embeddings")
    val dir = Files.createTempDirectory("json-emb").toString
    Formats.writeJson(src, dir)
    val back = Formats.readJson(spark, dir, src.schema)
    assert(canon(back) == canon(src))
  }

  test("ORC round-trip preserves the orders table (timestamps included)") {
    val src = Tables.t(spark, sf(), "orders")
    val dir = Files.createTempDirectory("orc-rt").toString
    Formats.writeOrc(src, dir)
    val back = Formats.readOrc(spark, dir)
    assert(back.schema == src.schema)
    assert(canon(back) == canon(src))
  }

  test("csv splits into multiple input partitions under a small split size") {
    val src = Tables.t(spark, sf(), "lineitem")
    val dir = Files.createTempDirectory("csv-split").toString
    Formats.writeCsv(src.coalesce(1), dir)
    val prev = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
      val parts = Formats.readCsv(spark, dir, src.schema).rdd.getNumPartitions
      assert(parts > 1, s"expected byte-range splitting, got $parts partition(s)")
    } finally prev.foreach(spark.conf.set("spark.sql.files.maxPartitionBytes", _))
  }
}
