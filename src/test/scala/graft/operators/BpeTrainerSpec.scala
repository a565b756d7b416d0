package graft.operators

import graft.SparkSpec
import graft.functions.BpeMerge
import org.apache.spark.sql.functions._

class BpeTrainerSpec extends SparkSpec {

  test("fertility: per-lang totals reconcile with the per-doc encode totals") {
    val fert = BpeTrainer.queries("ta_bpe_fertility")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(fert.nonEmpty)
    // Σ per-lang token totals == Σ per-doc encode totals (same pricing).
    val encTotal = BpeTrainer.queries("ta_bpe_encode")(spark, sf())
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(fert.map(_._3).sum == encTotal, "lang totals diverge from doc totals")
    fert.foreach { case (lang, nw, nt, f, cpt) =>
      assert(nt >= nw, s"$lang: a word encodes to at least one token")
      assert(f == nt.toDouble / nw && f >= 1.0, s"$lang fertility")
      assert(cpt >= 1.0, s"$lang: a token carries at least one character")
    }
  }

  /** One left-to-right non-overlapping rewrite (the reference rule). */
  private def rewrite(s: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Reference BPE: straight-line Scala over a word-frequency map. */
  private def referenceMerges(wf: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var syms: Map[Vector[String], Long] =
      wf.groupBy { case (w, _) => w.map(_.toString).toVector }
        .map { case (s, m) => s -> m.values.sum }
    (1 to k).map { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((s, f) <- syms; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      val ((a, b), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      syms = syms.groupBy { case (s, _) => rewrite(s, a, b) }.map { case (s, m) => s -> m.values.sum }
      (a, b, cnt)
    }
  }

  test("merge table equals the reference implementation over the same word frequencies") {
    val wf = Relational.t(spark, sf(), "documents")
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceMerges(wf, BpeTrainer.Merges)
    val got = BpeTrainer.queries("ta_bpe_merges")(spark, sf()).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("round-1 winner is the argmax of the oracle-checked pair counts") {
    val top = BpeTrainer.queries("ta_bpe_pairs")(spark, sf()).collect().head
    val first = BpeTrainer.queries("ta_bpe_merges")(spark, sf()).collect()
      .find(_.getInt(0) == 1).get
    assert(first.getString(1) + first.getString(2) == top.getString(0))
    assert(first.getLong(3) == top.getLong(1))
  }

  test("encode prices every document under the trained vocab, priced per vocab word") {
    val docs = Relational.t(spark, sf(), "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase(java.util.Locale.ROOT).split(" +").filter(_.nonEmpty).toSeq)
      .toMap
    val wf = docs.values.flatten.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val merges = referenceMerges(wf, BpeTrainer.Merges)
    def encLen(w: String): Long = {
      var s = w.map(_.toString).toVector
      merges.foreach { case (a, b, _) => s = rewrite(s, a, b) }
      s.length.toLong
    }
    val expect = docs.map { case (id, ws) => id -> ws.map(encLen).sum }
    val got = BpeTrainer.queries("ta_bpe_encode")(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // Merging strictly compresses: token count below char count, at or
    // above word count.
    docs.foreach { case (id, ws) =>
      assert(got(id) <= ws.map(_.length).sum && got(id) >= ws.length)
    }
  }

  test("training stops cleanly when the vocabulary exhausts its pairs") {
    import spark.implicits._
    // All single-symbol words: no adjacent pair exists — zero merge rounds,
    // not a corrupted/truncated table.
    val flat = BpeTrainer.trainMergesFrom(
      Seq((Seq("a"), 3L), (Seq("b"), 2L)).toDF("s", "f")).collect()
    assert(flat.isEmpty)
    // One mergeable pair, then exhaustion: exactly one round is emitted
    // even though Merges rounds were requested.
    val one = BpeTrainer.trainMergesFrom(
      Seq((Seq("a", "b"), 2L)).toDF("s", "f")).collect()
    assert(one.length == 1)
    assert(one.head.getString(1) == "a" && one.head.getString(2) == "b"
      && one.head.getLong(3) == 2L)
  }

  test("BpeMerge rewrites leftmost-first non-overlapping") {
    val df = spark.sql("SELECT array('a','a','a','b','a','a') AS s")
      .select(BpeMerge(col("s"), lit("a"), lit("a")).as("m"))
    assert(df.collect().head.getSeq[String](0) == Seq("aa", "a", "b", "aa"))
    val noHit = spark.sql("SELECT array('x','y') AS s")
      .select(BpeMerge(col("s"), lit("a"), lit("b")).as("m"))
    assert(noHit.collect().head.getSeq[String](0) == Seq("x", "y"))
  }

  test("merge counts never increase across rounds on this corpus")  {
    val counts = BpeTrainer.queries("ta_bpe_merges")(spark, sf()).collect()
      .sortBy(_.getInt(0)).map(_.getLong(3))
    // Not a theorem of BPE in general (a merge can create a new frequent
    // pair), but it holds on this corpus and pins accidental count
    // inflation (e.g. double-counting after a rewrite).
    counts.zip(counts.tail).foreach { case (x, y) => assert(x >= y, s"$x -> $y") }
  }
}
