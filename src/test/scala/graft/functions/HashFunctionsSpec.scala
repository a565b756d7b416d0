package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("fnv64 matches published FNV-1a 64 test vectors") {
    // Public vectors for FNV-1a 64 (Fowler/Noll/Vo reference implementation).
    assert(HashFunctions.fnv64("") == 0xcbf29ce484222325L)
    assert(HashFunctions.fnv64("a") == 0xaf63dc4c8601ec8cL)
    assert(HashFunctions.fnv64("foobar") == 0x85944171f73967e8L)
  }

  test("Fnv64 expression (codegen path) agrees with reference implementation") {
    val in = Seq("", "a", "foobar", "the quick brown fox", "éè寿")
    val got = in.toDF("s").select(HashFunctions.fnv64(col("s"))).as[Long].collect().toSeq
    assert(got == in.map(HashFunctions.fnv64))
  }

  test("Fnv64 stays inside whole-stage codegen") {
    // A LocalTableScan would be evaluated eagerly on the driver; use a real
    // distributed source so the projection goes through codegen.
    val df = spark.range(10).select(HashFunctions.fnv64(col("id").cast("string")).as("h"))
    // The `*(n)` prefix in the compact plan string marks WholeStageCodegen stages.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [fnv64("), plan)
    // And the codegen result agrees with the reference implementation.
    assert(df.as[Long].collect().toSeq == (0L until 10L).map(i => HashFunctions.fnv64(i.toString)))
  }

  test("md5Long matches the DuckDB formulation (precomputed)") {
    // DuckDB: SELECT CAST('0x' || substr(md5('a'), 1, 15) AS BIGINT) = 57446577476672362
    val got = Seq("a").toDF("s").select(HashFunctions.md5Long(col("s"))).as[Long].head()
    assert(got == 57446577476672362L)
  }
}
