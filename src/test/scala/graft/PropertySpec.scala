package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GazetteUuid
import graft.streaming.{Sequencer, StreamingHeavyHitters}

/** ScalaCheck properties over the engine's pure kernels (SURVEY §5's
  * property-test plan): UUID bit-packing, sequencer exactly-once
  * invariants under random interleaving and batching, Misra-Gries
  * guarantees. No SparkSession — these run in milliseconds.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 200): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  test("uuid pack/unpack is the identity on (producer, clock, flags)") {
    val gen = for {
      p <- Gen.containerOfN[Array, Byte](6, Gen.choose(Byte.MinValue, Byte.MaxValue))
      c <- Gen.choose(Long.MinValue, Long.MaxValue) // full 64-bit clock space
      f <- Gen.choose(0, 0x3ff)
    } yield (p, c, f)
    check(Prop.forAll(gen) { case (p, c, f) =>
      val u = GazetteUuid.build(p, c, f)
      GazetteUuid.clockOf(u) == c &&
        GazetteUuid.flagsOf(u) == f &&
        java.util.Arrays.equals(GazetteUuid.producerOf(u), p) &&
        // RFC 4122 invariants: version 1, variant 10xx.
        (u(6) & 0xf0) == 0x10 && (u(8) & 0xc0) == 0x80
    })
  }

  test("clock/micros conversion round-trips at µs resolution") {
    check(Prop.forAll(Gen.choose(0L, 4102444800000000L)) { micros =>
      GazetteUuid.clockToMicros(GazetteUuid.microsToClock(micros)) == micros
    })
  }

  // Random per-producer scripts: monotonically increasing clocks with
  // injected duplicates, CONTINUE spans, ACKs, OUTSIDE messages.
  private val scriptGen: Gen[Vector[Sequencer.SeqEnvelope]] = for {
    n <- Gen.choose(1, 40)
    kinds <- Gen.containerOfN[Vector, Int](n, Gen.frequency(
      5 -> Sequencer.ContinueTxn, 2 -> Sequencer.AckTxn, 2 -> Sequencer.OutsideTxn))
    dups <- Gen.containerOfN[Vector, Boolean](n, Gen.prob(0.2))
  } yield {
    var clock = 10L
    var off = 0L
    kinds.zip(dups).zipWithIndex.map { case ((k, dup), i) =>
      if (!dup) clock += 1 + (i % 3)
      off += 10
      Sequencer.SeqEnvelope("j", off, off + 10, "p", clock, k, s"m$i")
    }
  }

  test("sequencer: data clocks strictly increase; no duplicate deliveries") {
    check(Prop.forAll(scriptGen) { script =>
      val (out, _) = Sequencer.advance(Sequencer.initialState, script.iterator)
      // Data messages (CONTINUE spans, OUTSIDE) are exactly-once: their
      // clocks strictly increase. An ACK legitimately shares the clock
      // of the last message of its span, so the full committed stream
      // is only non-decreasing.
      val data = out.filter(_.flags != Sequencer.AckTxn).map(_.clock)
      val all = out.map(_.clock)
      data == data.distinct.sorted &&
        all.zip(all.drop(1)).forall { case (a, b) => a <= b }
    }, n = 500)
  }

  test("sequencer: committed output is invariant to micro-batch boundaries") {
    val gen = for {
      s <- scriptGen
      cut <- Gen.choose(0, s.length)
      cut2 <- Gen.choose(0, s.length)
    } yield (s, cut min cut2, cut max cut2)
    check(Prop.forAll(gen) { case (script, c1, c2) =>
      val (all, _) = Sequencer.advance(Sequencer.initialState, script.iterator)
      val (o1, s1) = Sequencer.advance(Sequencer.initialState, script.slice(0, c1).iterator)
      val (o2, s2) = Sequencer.advance(s1, script.slice(c1, c2).iterator)
      val (o3, _) = Sequencer.advance(s2, script.slice(c2, script.length).iterator)
      (o1 ++ o2 ++ o3) == all
    }, n = 500)
  }

  test("misra-gries: every token with freq > total/k survives; state < k") {
    val gen = for {
      k <- Gen.choose(2, 8)
      toks <- Gen.nonEmptyContainerOf[Vector, String](
        Gen.frequency(3 -> Gen.const("hot"),
          7 -> Gen.choose(0, 500).map(i => s"t$i")))
      cuts <- Gen.choose(1, 4)
    } yield (k, toks, cuts)
    check(Prop.forAll(gen) { case (k, toks, cuts) =>
      // Feed in `cuts` batches to exercise cross-batch state carry.
      val groups = toks.grouped(math.max(1, toks.length / cuts)).toList
      val fin = groups.foldLeft(StreamingHeavyHitters.SlotState(Map.empty, 0L)) {
        (st, g) => StreamingHeavyHitters.advance(st, g.iterator, k)
      }
      val freq = toks.groupBy(identity).view.mapValues(_.size.toLong)
      val heavy = freq.filter(_._2 * k > toks.length).keys
      fin.counts.size <= k - 1 &&
        heavy.forall(fin.counts.contains) &&
        fin.counts.forall { case (t, est) =>
          est <= freq(t) && est >= freq(t) - toks.length / k
        }
    }, n = 500)
  }

  test("drift state: hellinger2 is bounded in [0,1], 0 on self, merge-order-free") {
    import graft.streaming.StreamingDrift
    val buckets = 32
    val tokGen = Gen.listOf(Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"))
    check(Prop.forAll(tokGen, tokGen) { (a, b) =>
      val ref = StreamingDrift.bucketDistribution(b.iterator, buckets)
      val c = new Array[Long](buckets)
      a.foreach(t => c(StreamingDrift.bucket(t, buckets)) += 1)
      val h = graft.streaming.StreamingDrift.hellinger2(c, a.size.toLong, ref)
      val self = StreamingDrift.bucketDistribution(a.iterator, buckets)
      val cSelf = new Array[Long](buckets)
      a.foreach(t => cSelf(StreamingDrift.bucket(t, buckets)) += 1)
      val hSelf = graft.streaming.StreamingDrift.hellinger2(cSelf, a.size.toLong, self)
      h >= 0.0 && h <= 1.0 + 1e-12 && math.abs(hSelf) < 1e-12
    })
  }

  test("scaled-long covariance accumulation is associative and commutative") {
    import graft.operators.Decomposition
    val vGen = Gen.listOfN(3, Gen.chooseNum(-4.0f, 4.0f))
      .map(_.toArray)
    val corpus = Gen.nonEmptyListOf(vGen)
    check(Prop.forAll(corpus, Gen.chooseNum(1, 5)) { (vs, splitAt) =>
      val agg = new Decomposition.CovAgg(3)
      def reduceAll(xs: Seq[Array[Float]]) =
        xs.foldLeft(agg.zero)(agg.reduce)
      val whole = reduceAll(vs)
      val k = math.min(splitAt, vs.size)
      val (l, r) = vs.splitAt(k)
      val merged = agg.merge(reduceAll(l), reduceAll(r))
      whole.n == merged.n &&
        whole.s.sameElements(merged.s) && whole.p.sameElements(merged.p)
    })
  }

  test("mmr greedy: distinct picks, min(k,n) size, argmax-rel first, order-free") {
    import graft.operators.Similarity
    val cand = for {
      id <- Gen.choose(0L, 30L)
      rel <- Gen.chooseNum(-1.0, 1.0).map(x => math.floor(x * 1e6) / 1e6)
      v <- Gen.listOfN(4, Gen.chooseNum(-2.0f, 2.0f).suchThat(_ != 0f))
    } yield (id, rel, v.toArray)
    val poolGen = Gen.nonEmptyListOf(cand)
      .map(_.distinctBy(_._1).toArray) // ids are identities
    check(Prop.forAll(poolGen, Gen.choose(1, 6),
        Gen.chooseNum(0.1, 0.9)) { (pool, k, lambda) =>
      val out = Similarity.mmrGreedy(pool, k, lambda)
      val ids = out.map(_._1)
      val maxRel = pool.map(c => (-c._2, c._1)).min
      ids.distinct.size == ids.size &&
        out.size == math.min(k, pool.length) &&
        out.map(_._2) == (1 to out.size).map(_.toLong).toVector &&
        // step 1 is the pure-relevance argmax (ties to lower id)
        out.head._1 == maxRel._2 &&
        // input order is irrelevant: the kernel canonicalizes
        Similarity.mmrGreedy(pool.reverse, k, lambda) == out
    })
  }
}
