package graft.streaming

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property cases for the session fold (fixed-seed Gens, like
  * TextPropertySpec): the law that makes q71 CORRECT as a streaming
  * operator is that incremental folding over any time-ordered batch
  * split equals one-shot folding — the micro-batch boundary must be
  * unobservable in the result. Pure JVM, no Spark session needed.
  */
class SessionizePropertySpec extends AnyFunSuite {

  private val Gap = 10L

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7000L + i)))

  // sorted timestamps with duplicates and both dense and sparse runs
  private val tsGen: Gen[List[Long]] =
    Gen.listOfN(40, Gen.choose(0L, 300L)).map(_.sorted)

  test("incremental folding equals one-shot folding for any ordered split") {
    for (ts <- samples(tsGen, 50)) {
      val batch = Sessionize.fold(Nil, ts.toArray, Gap)
      // fully incremental: one event per micro-batch
      val oneByOne = ts.foldLeft(List.empty[(Long, Long, Long)]) {
        (acc, t) => Sessionize.fold(acc, Array(t), Gap)
      }
      assert(oneByOne === batch)
      // coarse 3-way split
      val (a, rest) = ts.splitAt(ts.size / 3)
      val (b, c) = rest.splitAt(rest.size / 3)
      val threeBatches = List(a, b, c).foldLeft(List.empty[(Long, Long, Long)]) {
        (acc, chunk) => Sessionize.fold(acc, chunk.toArray, Gap)
      }
      assert(threeBatches === batch)
    }
  }

  test("sessions partition the events with gap-separated boundaries") {
    for (ts <- samples(tsGen, 50)) {
      val ss = Sessionize.fold(Nil, ts.toArray, Gap)
      assert(ss.map(_._3).sum === ts.size, "every event lands in a session")
      ss.foreach { case (s, e, n) => assert(s <= e && n >= 1) }
      assert(ss === ss.sortBy(_._1), "sessions are chronological")
      ss.sliding(2).foreach {
        case List((_, e1, _), (s2, _, _)) =>
          assert(s2 - e1 >= Gap, s"adjacent sessions closer than the gap")
        case _ => ()
      }
      assert(ts.forall(t => ss.exists { case (s, e, _) => s <= t && t <= e }),
        "every event is covered by its session's [start, end]")
    }
  }
}
