package graft.sources

import graft.SparkSpec

/** The engine's logical-schema contract with the driver corpus.
  *
  * The testdata is regenerated between rounds and its PHYSICAL layouts have
  * already drifted once (events.ts shipped as TIMESTAMP(NANOS) in one
  * generation and plain micros TIMESTAMP_NTZ in the next — 23 queries broke
  * at once). [[Tables]] absorbs physical drift; this spec pins the LOGICAL
  * schema every operator compiles against, so the next drift fails here
  * with a precise message instead of as a mass of downstream query errors.
  */
class SchemaContractSpec extends SparkSpec {

  private val expected: Map[String, Map[String, String]] = Map(
    "region" -> Map("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Map("n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Map("c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Map("s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double"),
    "part" -> Map("p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    "orders" -> Map("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Map("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string", "l_shipdate" -> "timestamp_ntz"),
    // ts is the one PHYSICALLY drifting column; Tables.normalizeTs pins the
    // logical type to session-zone TIMESTAMP whatever the file holds.
    "events" -> Map("event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"),
    "documents" -> Map("doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Map("vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int")
  )

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$table exposes the contracted logical schema") {
      val got = Tables.t(spark, sf(), table).schema
        .map(f => f.name -> f.dataType.simpleString).toMap
      for ((name, tpe) <- cols) {
        assert(got.contains(name),
          s"$table lost column $name (has: ${got.keys.toSeq.sorted.mkString(", ")}) — " +
            "testdata drift? see sources/Tables.scala")
        assert(got(name) == tpe,
          s"$table.$name is ${got(name)}, engine compiled against $tpe — " +
            "physical layout drifted; absorb it in sources/Tables.scala like events.ts")
      }
    }
  }
}
