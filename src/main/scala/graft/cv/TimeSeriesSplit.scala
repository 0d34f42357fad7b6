package graft.cv

/** Expanding-window split arithmetic over an axis of `nSamples` ordered
  * positions, replicating sklearn's `TimeSeriesSplit` exactly as used by the
  * reference (`panelsplit/cross_validation.py:119-127`): folds are anchored to
  * the END of the axis, train is the prefix before the test block minus `gap`,
  * optionally tail-capped at `maxTrainSize`.
  *
  * Pure driver-side arithmetic — the axis here is the *distinct sorted period
  * axis* (small by construction), never row space.
  */
object TimeSeriesSplit {

  /** One fold as index ranges into the 0-based axis. */
  final case class AxisFold(train: Range, test: Range)

  /** @param nSamples     length of the (distinct period) axis
    * @param nSplits      number of folds
    * @param gap          periods skipped between train end and test start
    * @param testSize     periods per test block; None = nSamples/(nSplits+1)
    * @param maxTrainSize tail-cap on the train block length
    */
  def split(
      nSamples: Int,
      nSplits: Int,
      gap: Int = 0,
      testSize: Option[Int] = None,
      maxTrainSize: Option[Int] = None): Vector[AxisFold] = {
    require(nSplits >= 1, s"nSplits must be >= 1, got $nSplits")
    val nFolds = nSplits + 1
    require(
      nFolds <= nSamples,
      s"Cannot have number of folds=$nFolds greater than the number of samples=$nSamples")
    val tSize = testSize.getOrElse(nSamples / nFolds)
    require(tSize > 0, s"testSize must be > 0, got $tSize")
    require(
      nSamples - gap - tSize * nSplits > 0,
      s"Too many splits=$nSplits for number of samples=$nSamples with testSize=$tSize and gap=$gap")

    (0 until nSplits).toVector.map { i =>
      val testStart = nSamples - (nSplits - i) * tSize
      val trainEnd = testStart - gap
      val trainStart = maxTrainSize match {
        case Some(m) if m < trainEnd => trainEnd - m
        case _                       => 0
      }
      AxisFold(trainStart until trainEnd, testStart until math.min(testStart + tSize, nSamples))
    }
  }
}
