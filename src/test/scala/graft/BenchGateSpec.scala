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
