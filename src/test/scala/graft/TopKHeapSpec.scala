package graft

import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKHeap

class TopKHeapSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("heap keeps the k smallest (dist, id) pairs, rank-ordered") {
    check(Prop.forAll { (pairs: List[(Double, Long)], kRaw: Byte) =>
      val k = math.abs(kRaw % 20) + 1
      val clean = pairs.filterNot { case (d, _) => d.isNaN }
      val heap = new TopKHeap(k)
      clean.foreach { case (d, i) => heap.insert(d, i) }
      // heap keeps distinct (dist, id) pairs
      heap.sortedIds.toList == clean.distinct.sorted.take(k).map(_._2)
    })
  }

  test("merge equals union") {
    check(Prop.forAll { (a: List[(Double, Long)], b: List[(Double, Long)]) =>
      val ca = a.filterNot(_._1.isNaN); val cb = b.filterNot(_._1.isNaN)
      val h1 = new TopKHeap(5); ca.foreach { case (d, i) => h1.insert(d, i) }
      val h2 = new TopKHeap(5); cb.foreach { case (d, i) => h2.insert(d, i) }
      h2.mergeInto(h1)
      val all = new TopKHeap(5); (ca ++ cb).foreach { case (d, i) => all.insert(d, i) }
      h1.sortedIds.toList == all.sortedIds.toList
    })
  }

  test("empty and k=1 edges") {
    val h = new TopKHeap(3)
    assert(h.sortedIds.isEmpty)
    val h1 = new TopKHeap(1)
    Seq((3.0, 3L), (1.0, 1L), (2.0, 2L)).foreach { case (d, i) => h1.insert(d, i) }
    assert(h1.sortedIds.toList == List(1L))
  }
}
