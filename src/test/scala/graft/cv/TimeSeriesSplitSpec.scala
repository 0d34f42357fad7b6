package graft.cv

import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSplitSpec extends AnyFunSuite {

  test("matches sklearn TimeSeriesSplit: n=3 axis, nSplits=2, testSize=1 (reference doctest cross_validation.py:228-242)") {
    val folds = TimeSeriesSplit.split(nSamples = 3, nSplits = 2, testSize = Some(1))
    assert(folds.map(f => (f.train.toVector, f.test.toVector)) ==
      Vector((Vector(0), Vector(1)), (Vector(0, 1), Vector(2))))
  }

  test("matches reference doctest cross_validation.py:85-90: axis of 3 distinct periods") {
    // periods [1,1,2,2,3,3] -> axis [1,2,3]; folds over axis positions
    val folds = TimeSeriesSplit.split(nSamples = 3, nSplits = 2, testSize = Some(1))
    assert(folds(0).train == (0 until 1) && folds(0).test == (1 until 2))
    assert(folds(1).train == (0 until 2) && folds(1).test == (2 until 3))
  }

  test("10 periods, 3 splits (reference tests/test_PanelSplit.py:29-49)") {
    val folds = TimeSeriesSplit.split(nSamples = 10, nSplits = 3, testSize = Some(1))
    assert(folds.map(f => (f.train.last, f.test.toVector)) ==
      Vector((6, Vector(7)), (7, Vector(8)), (8, Vector(9))))
    assert(folds.forall(_.train.start == 0))
  }

  test("gap shifts train end back; maxTrainSize caps train tail") {
    val folds = TimeSeriesSplit.split(nSamples = 10, nSplits = 2, gap = 2, testSize = Some(2))
    // test starts at 6 and 8; train ends at start-gap
    assert(folds(0).test == (6 until 8) && folds(0).train == (0 until 4))
    assert(folds(1).test == (8 until 10) && folds(1).train == (0 until 6))
    val capped = TimeSeriesSplit.split(nSamples = 10, nSplits = 2, testSize = Some(2), maxTrainSize = Some(3))
    assert(capped(0).train == (3 until 6) && capped(1).train == (5 until 8))
  }

  test("default testSize = nSamples / (nSplits+1), sklearn default") {
    val folds = TimeSeriesSplit.split(nSamples = 12, nSplits = 3)
    // testSize = 12/4 = 3; test starts at 3,6,9
    assert(folds.map(_.test.start) == Vector(3, 6, 9))
    assert(folds.map(_.test.size) == Vector(3, 3, 3))
  }

  test("rejects infeasible configurations like sklearn") {
    assertThrows[IllegalArgumentException](TimeSeriesSplit.split(3, 3, testSize = Some(1)))
    assertThrows[IllegalArgumentException](TimeSeriesSplit.split(5, 2, gap = 3, testSize = Some(1)))
    assertThrows[IllegalArgumentException](TimeSeriesSplit.split(2, 2))
  }

  test("property sweep: folds anchored to axis end, expanding, ordered, gap honored") {
    val cases = for {
      n <- 4 to 40; k <- 1 to 5; ts <- 1 to 3; g <- 0 to 2
      if n - g - ts * k > 0 && k + 1 <= n
    } yield (n, k, ts, g)
    cases.foreach { case (n, k, ts, g) =>
      val folds = TimeSeriesSplit.split(n, k, g, Some(ts))
      assert(folds.size == k)
      // last fold's test ends at the axis end
      assert(folds.last.test.last == n - 1)
      folds.foreach { f =>
        assert(f.train.isEmpty || f.train.last < f.test.start)
        assert(f.test.start - f.train.end == g) // gap between train end and test start
      }
      // expanding: train sets are nested prefixes (no maxTrainSize)
      folds.sliding(2).foreach {
        case Vector(a, b) => assert(a.train.end <= b.train.end && a.train.start == 0)
        case _            =>
      }
      // union of test folds covers the last k*ts positions exactly
      assert(folds.flatMap(_.test).toSet == ((n - k * ts) until n).toSet)
    }
  }
}
