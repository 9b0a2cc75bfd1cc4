package graft

import java.sql.{Date, Timestamp}

import streaming.{Cusum, Ewma}

/** The correctness core of the stateful streaming operators is scan
  * composability: folding a key's events through ANY sequence of
  * micro-batches must equal the one-shot fold. The file-replay specs
  * prove one split each under a real readStream; this spec proves the
  * property exhaustively over every 2-way and a lattice of 3-way splits
  * of a fixed in-order event sequence — pure JVM, no Spark session.
  */
class ScanSplitPropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private val day = Date.valueOf("2024-03-01")

  private def ev(i: Int, v: Double): Ewma.VEvent =
    Ewma.VEvent("purchase", day, new Timestamp(1709251200000L + i * 60000L),
      i.toLong, v)

  // values chosen to cross both operators' interesting thresholds:
  // EWMA spikes (v > 2x trailing) and CUSUM alarms (S >= 80 at K = 60)
  private val events: Seq[Ewma.VEvent] =
    Seq(10.0, 25.0, 5.0, 90.0, 95.0, 99.0, 12.0, 88.0, 91.0, 3.0, 97.0,
      96.0, 94.0, 50.0, 70.0).zipWithIndex.map { case (v, i) => ev(i, v) }

  test("cusum scan composes across every 2-way and 3-way split") {
    val oneShot = Cusum.scan(None, events)
    assert(oneShot.alarms > 0, "fixture must actually alarm")
    for (i <- 0 to events.length) {
      val (a, b) = events.splitAt(i)
      val st = Cusum.scan(Some(Cusum.scan(None, a)), b)
      assert(st == oneShot, s"2-way split at $i: $st != $oneShot")
      for (j <- 0 to b.length) {
        val (b1, b2) = b.splitAt(j)
        val st3 = Cusum.scan(Some(Cusum.scan(Some(Cusum.scan(None, a)), b1)), b2)
        assert(st3 == oneShot, s"3-way split at ($i,$j): $st3 != $oneShot")
      }
    }
  }

  test("ewma scan composes across every 2-way and 3-way split") {
    val oneShot = Ewma.scan(None, events)
    assert(oneShot.spikes > 0, "fixture must actually spike")
    for (i <- 0 to events.length) {
      val (a, b) = events.splitAt(i)
      val st = Ewma.scan(if (i == 0) None else Some(Ewma.scan(None, a)), b)
      assert(st == oneShot, s"2-way split at $i: $st != $oneShot")
      for (j <- 0 to b.length) {
        val (b1, b2) = b.splitAt(j)
        val first = if (i == 0) None else Some(Ewma.scan(None, a))
        val st3 = Ewma.scan(Some(Ewma.scan(first, b1)), b2)
        assert(st3 == oneShot, s"3-way split at ($i,$j): $st3 != $oneShot")
      }
    }
  }

  test("scan is order-insensitive within a batch (sorts internally)") {
    val shuffled = Seq(events(3), events(0), events(7), events(1),
      events(2), events(5), events(4), events(6)) ++ events.drop(8)
    assert(Cusum.scan(None, shuffled) == Cusum.scan(None, events))
    assert(Ewma.scan(None, shuffled) == Ewma.scan(None, events))
  }
}
