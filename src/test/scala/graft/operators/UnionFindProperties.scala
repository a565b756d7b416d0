package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property proofs for [[Dedup.unionFindMinRoots]] — the partition-local
  * leaf kernel of the multilevel geometric CC ([[Spatial.geoComponents]]).
  * The distributed scheme's correctness argument leans on two kernel
  * invariants, so they get direct proofs over arbitrary edge lists:
  *
  *  1. '''Min-root''': every emitted root is the MINIMUM node id of its
  *     connected component (computed independently here by BFS). This is
  *     what makes per-level contractions compose — a later level re-derives
  *     a contracted root's supercell from the id, and the final fold's
  *     labels equal the global component minima.
  *  2. '''Order invariance''': the emitted (node → root) map is identical
  *     under any permutation of the edge list. Spark's group iterators are
  *     unordered, so a kernel sensitive to arrival order would make the
  *     whole distributed result nondeterministic.
  *
  * Plus the coverage contract: every endpoint appears exactly once (roots
  * as identity rows), which the callers' left-join-and-coalesce edge
  * rewriting relies on.
  */
object UnionFindProperties extends Properties("UnionFindMinRoots") {

  // Small id space to force dense collisions, chains, and self-loops.
  private val edge = for { a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L) } yield (a, b)
  private val edges = Gen.listOf(edge)
  private val seed = Gen.choose(0L, Long.MaxValue)

  /** Independent ground truth: BFS component minima over the same edges. */
  private def bfsMinima(es: List[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
    es.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val label = scala.collection.mutable.Map.empty[Long, Long]
    nodes.foreach { n =>
      if (!label.contains(n)) {
        val comp = scala.collection.mutable.Set(n)
        val queue = scala.collection.mutable.Queue(n)
        while (queue.nonEmpty) adj(queue.dequeue()).foreach { m =>
          if (comp.add(m)) queue.enqueue(m)
        }
        val root = comp.min
        comp.foreach(c => label(c) = root)
      }
    }
    label.toMap
  }

  property("every root is its component's minimum id") = forAll(edges) { es =>
    val got = Dedup.unionFindMinRoots(es.iterator).toMap
    got == bfsMinima(es)
  }

  property("result is invariant under edge arrival order") =
    forAll(edges, seed) { (es, s) =>
      val base = Dedup.unionFindMinRoots(es.iterator).toMap
      val shuffled = new scala.util.Random(s).shuffle(es)
      base == Dedup.unionFindMinRoots(shuffled.iterator).toMap &&
        base == Dedup.unionFindMinRoots(es.reverse.iterator).toMap
    }

  property("every endpoint emitted exactly once; roots are identity rows") =
    forAll(edges) { es =>
      val out = Dedup.unionFindMinRoots(es.iterator).toList
      val nodes = es.flatMap(e => Seq(e._1, e._2)).toSet
      out.map(_._1).toSet == nodes &&
        out.size == nodes.size &&
        out.filter { case (n, r) => n == r }.map(_._1).toSet == out.map(_._2).toSet
    }
}
