package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, count, lit, when}

class PipelineSpec extends SparkSpec {

  test("hash splits are disjoint, exhaustive, and roughly 80/10/10") {
    val counts = Pipeline.queries("sp_split_assign")(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Relational.t(spark, sf(), "documents").count()
    assert(counts.keySet == Set("train", "val", "test"))
    // Exhaustive + disjoint by construction: the bucket ranges partition
    // [0, 100), so the split sizes must sum to exactly the corpus size.
    assert(counts.values.sum == total)
    // The md5 buckets are uniform enough that train holds the strict
    // majority even on a 500-doc corpus.
    assert(counts("train") > total / 2)
  }

  test("observe() quality counters ride the corpus scan without a second pass") {
    import org.apache.spark.sql.Observation
    // The operational pattern for a 100 TB pipeline run: data-quality
    // counters (row count, null keys, short docs) collected as observed
    // metrics on the SAME job that produces the output — no second scan,
    // no separate monitoring query. Cross-checked against an independent
    // aggregation.
    val obs = new Observation("corpus_quality")
    val src = Relational.t(spark, sf(), "documents")
    val out = src.observe(obs,
      count(lit(1)).as("n_rows"),
      count(when(col("n_chars") < 100, 1)).as("n_short"),
      count(when(col("lang").isNull, 1)).as("n_null_lang"))
      .filter(col("n_chars") >= 100)
    val kept = out.count()
    val m = obs.get
    val expected = src.agg(
      count(lit(1)), count(when(col("n_chars") < 100, 1)), count(when(col("lang").isNull, 1)))
      .collect().head
    assert(m("n_rows") == expected.getLong(0))
    assert(m("n_short") == expected.getLong(1))
    assert(m("n_null_lang") == expected.getLong(2))
    assert(kept == expected.getLong(0) - expected.getLong(1))
  }

  test("sample membership is a pure function of doc_id (stable under repartitioning)") {
    val base = Pipeline.queries("sp_hash_sample")(spark, sf())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val re = Pipeline.queries("sp_hash_sample")(spark, sf())
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(re == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // And the sample is a subset of the train/val/test universe with the
    // documented rate: bucket < 10 of 100 ⇒ sample ⊆ train (bucket < 80).
    val trainIds = Relational.t(spark, sf(), "documents")
      .filter(Pipeline.bucket(col("doc_id")) < 80)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(base.subsetOf(trainIds))
  }
}
