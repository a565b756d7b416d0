package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaintenanceSpec extends SparkSpec {

  test("compaction cuts file count and preserves content exactly") {
    val src = Relational.t(spark, sf(), "documents")
    val frag = java.nio.file.Files.createTempDirectory("mt-frag").toString
    val out = java.nio.file.Files.createTempDirectory("mt-out").toString
    src.repartition(37).write.mode("overwrite").parquet(frag)
    val before = Maintenance.dataFileCount(spark, frag)
    assert(before == 37)

    val target = Maintenance.compact(spark, frag, out, 8L * 1024 * 1024)
    val after = Maintenance.dataFileCount(spark, out)
    assert(after == target, s"wrote $after files, planned $target")
    assert(after < before, "compaction must reduce file count")

    // Content equality, layout-independent.
    val a = src.orderBy("doc_id").collect().map(_.toSeq)
    val b = spark.read.parquet(out).orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("target count follows the byte budget") {
    val frag = java.nio.file.Files.createTempDirectory("mt-frag2").toString
    val out = java.nio.file.Files.createTempDirectory("mt-out2").toString
    Relational.t(spark, sf(), "documents").repartition(10).write.mode("overwrite").parquet(frag)
    // A huge byte budget collapses everything to one file.
    assert(Maintenance.compact(spark, frag, out, Long.MaxValue / 2) == 1)
    assert(Maintenance.dataFileCount(spark, out) == 1)
  }
}
