package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{TopKBuf, TopKPairs}

/** Property tests for the bounded top-k buffer backing the ANN
  * ranking aggregate: any interleaving of inserts, merges, and
  * serde round-trips must agree with the naive sort-everything
  * reference on (score desc, id asc) ordering.
  */
class TopKPairsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  // multiset semantics: duplicate (score, id) rows count twice, just
  // as duplicate candidate rows would reach the aggregate twice
  private def naiveTopK(pairs: Seq[(Double, Long)], k: Int): Seq[Long] =
    pairs.sortBy { case (s, id) => (-s, id) }.take(k).map(_._2)

  private def result(buf: TopKBuf): Seq[Long] =
    buf.sortedIdx.map(buf.ids).toSeq

  // few distinct scores → dense ties, the case where ordering bugs hide
  private val pairGen: Gen[(Double, Long)] = for {
    s <- Gen.chooseNum(0, 5).map(_ / 5.0)
    id <- Gen.chooseNum(0L, 50L)
  } yield (s, id)

  test("insert-only equals naive sort, under heavy ties") {
    check(Prop.forAll(Gen.listOf(pairGen), Gen.chooseNum(1, 12)) {
      (pairs, k) =>
        val buf = new TopKBuf(k)
        pairs.foreach { case (s, id) => buf.insert(s, id) }
        result(buf) == naiveTopK(pairs, k)
    })
  }

  test("arbitrary split-and-merge equals naive sort") {
    check(Prop.forAll(Gen.listOf(pairGen), Gen.chooseNum(1, 12),
      Gen.chooseNum(0, 100)) { (pairs, k, cut) =>
      val (a, b) = pairs.splitAt(
        if (pairs.isEmpty) 0 else cut % (pairs.length + 1))
      val (ba, bb) = (new TopKBuf(k), new TopKBuf(k))
      a.foreach { case (s, id) => ba.insert(s, id) }
      b.foreach { case (s, id) => bb.insert(s, id) }
      var i = 0
      while (i < bb.n) { ba.insert(bb.scores(i), bb.ids(i)); i += 1 }
      result(ba) == naiveTopK(pairs, k)
    })
  }

  test("NaN scores never enter or poison the buffer") {
    val buf = new TopKBuf(3)
    buf.insert(0.1, 1); buf.insert(0.2, 2); buf.insert(Double.NaN, 3)
    // NaN rejected while filling: only 2 entries so far
    assert(buf.n == 2)
    buf.insert(0.05, 4); buf.insert(Double.NaN, 5)
    // full buffer: NaN must not block later displacement
    buf.insert(0.9, 6)
    assert(result(buf) == Seq(6L, 2L, 1L))
    // NaN-heavy random streams still match the naive oracle over the
    // non-NaN pairs
    val nanGen = Gen.oneOf(pairGen,
      Gen.chooseNum(0L, 50L).map(id => (Double.NaN, id)))
    check(Prop.forAll(Gen.listOf(nanGen), Gen.chooseNum(1, 12)) {
      (pairs, k) =>
        val b = new TopKBuf(k)
        pairs.foreach { case (s, id) => b.insert(s, id) }
        result(b) == naiveTopK(pairs.filterNot(_._1.isNaN), k)
    })
  }

  test("serialize/deserialize round-trips the buffer") {
    check(Prop.forAll(Gen.listOf(pairGen), Gen.chooseNum(1, 12)) {
      (pairs, k) =>
        val buf = new TopKBuf(k)
        pairs.foreach { case (s, id) => buf.insert(s, id) }
        val agg = TopKPairs(null, null, k)
        result(agg.deserialize(agg.serialize(buf))) == result(buf)
    })
  }
}
