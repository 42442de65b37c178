package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact canary gate, spec'd as the pure decision it is
  * (the full Bench main is an integration surface; the routing rule
  * must not regress silently inside it).
  */
class BenchGateSpec extends AnyFunSuite {

  test("noisy iff score over the floor AND no better than the committed score") {
    // the measured r14 case: a 3.2x-score run must REPLACE a
    // 16.1x-score committed artifact
    assert(!Bench.isNoisy(0.0289, 0.0935, committedScore = 16.1))
    // a degraded run must not replace a cleaner committed artifact
    assert(Bench.isNoisy(0.030, 0.50, committedScore = 3.2))
    // under the absolute floor: always clean, whatever is committed
    assert(!Bench.isNoisy(0.030, 0.06, committedScore = 1.0))
    // no committed artifact (Infinity bar): only the floor applies —
    // the first artifact is accepted even from a rough window
    assert(!Bench.isNoisy(0.030, 0.50, committedScore = Double.PositiveInfinity))
    // equal scores: the incumbent wins (>= keeps ties out)
    assert(Bench.isNoisy(0.030, 0.30, committedScore = 10.0))
    // no canaries ran: never noisy (nothing to judge the window by)
    assert(!Bench.isNoisy(-1.0, -1.0, committedScore = 1.0))
  }

  test("absolute-max escape: a window inside the committed noise envelope is clean") {
    // the measured r16 case: pre-touch dropped the canary median
    // 33 -> 24 ms, so a 74.5 ms blip scores 3.14 — but the committed
    // artifact's own worst blip is 78.9 ms; the window is cleaner in
    // absolute terms and must replace it
    assert(!Bench.isNoisy(0.0237, 0.0745, committedScore = 2.40,
      floor = 3.0, committedAbsMax = 0.0789))
    // equal worst blips: inside the envelope (<=), clean
    assert(!Bench.isNoisy(0.0237, 0.0789, committedScore = 2.40,
      floor = 3.0, committedAbsMax = 0.0789))
    // a blip worse than the committed worst: both arms degraded, noisy
    assert(Bench.isNoisy(0.0237, 0.0935, committedScore = 2.40,
      floor = 3.0, committedAbsMax = 0.0789))
    // the r15 driver-run stall window (227.7 ms max): still rejected
    assert(Bench.isNoisy(0.0417, 0.2277, committedScore = 2.40,
      floor = 3.0, committedAbsMax = 0.0789))
    // uniformly degraded window: median inflation keeps the score
    // over both bars even when its max/med ratio is modest
    assert(Bench.isNoisy(0.099, 0.50, committedScore = 2.40,
      floor = 3.0, committedAbsMax = 0.0789))
    // committedAbsMax unknown (0): the escape is disabled, prior rule
    assert(Bench.isNoisy(0.0237, 0.0745, committedScore = 2.40,
      floor = 3.0, committedAbsMax = 0.0))
  }

  test("committed absolute canary max parses from the totals JSON line") {
    val line = """{"metric":"total","value":156.28,"canary_med":0.0329,""" +
      """"canary_max":0.0789,"n_queries":196,"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.committedCanaryMaxOf(line).contains(0.0789))
    assert(Bench.committedCanaryMaxOf("""{"value":1}""").isEmpty)
    assert(Bench.committedCanaryMaxOf("""{"canary_max":-1.0}""").isEmpty)
  }

  test("committed score parses from the totals JSON line; absent/zeroed fields give None") {
    val line = """{"metric":"total","value":122.87,"unit":"sec","reps":3,""" +
      """"median_total":133.12,"canary_med":0.0289,"canary_max":0.0935,""" +
      """"n_queries":189,"n_errors":0,"sf":"/root/testdata/sf0.1"}"""
    val s = Bench.committedNoiseScoreOf(line)
    assert(s.exists(v => math.abs(v - 0.0935 / 0.0289) < 1e-9))
    assert(Bench.committedNoiseScoreOf("""{"value":1}""").isEmpty)
    assert(Bench.committedNoiseScoreOf(
      """{"canary_med":-1.0,"canary_max":-1.0}""").isEmpty)
  }
}
