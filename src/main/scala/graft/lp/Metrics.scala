package graft.lp

/** Quality metrics (reference ontolearn_light/metrics.py). Exact formula
  * parity including the zero-division → (false, 0) branches and the
  * 5-decimal rounding (reference rounds via Python `round`; we round
  * half-up, identical except exactly-at-boundary ties). */
sealed trait Metric {
  def name: String
  def score2(tp: Long, fn: Long, fp: Long, tn: Long): (Boolean, Double)
  protected def round5(x: Double): Double =
    BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
}

case object Recall extends Metric { // metrics.py:17-24
  val name = "Recall"
  def score2(tp: Long, fn: Long, fp: Long, tn: Long): (Boolean, Double) =
    if (tp + fn == 0) (false, 0.0)
    else (true, round5(tp.toDouble / (tp + fn)))
}

case object Precision extends Metric { // metrics.py:35-42
  val name = "Precision"
  def score2(tp: Long, fn: Long, fp: Long, tn: Long): (Boolean, Double) =
    if (tp + fp == 0) (false, 0.0)
    else (true, round5(tp.toDouble / (tp + fp)))
}

case object F1 extends Metric { // metrics.py:53-68: 0 when precision or recall is 0
  val name = "F1"
  def score2(tp: Long, fn: Long, fp: Long, tn: Long): (Boolean, Double) = {
    if (tp + fn == 0 || tp + fp == 0) return (false, 0.0)
    val recall = tp.toDouble / (tp + fn)
    val precision = tp.toDouble / (tp + fp)
    if (precision == 0 || recall == 0) (false, 0.0)
    else (true, round5(2 * ((precision * recall) / (precision + recall))))
  }
}

case object Accuracy extends Metric { // metrics.py:95-99: plain (tp+tn)/total
  val name = "Accuracy"
  def score2(tp: Long, fn: Long, fp: Long, tn: Long): (Boolean, Double) =
    (true, round5((tp + tn).toDouble / (tp + tn + fp + fn)))
}

case object WeightedAccuracy extends Metric { // metrics.py:113-119
  val name = "WeightedAccuracy"
  def score2(tp: Long, fn: Long, fp: Long, tn: Long): (Boolean, Double) = {
    val ap = (tp + fn).toDouble
    val an = (fp + tn).toDouble
    val wacc = ((tp / ap) + (tn / an)) / ((tp / ap) + (tn / an) + (fp / an) + (fn / ap))
    (true, round5(wacc))
  }
}
