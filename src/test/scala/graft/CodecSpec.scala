package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import graft.index.Codec
import graft.index.Codec.Posting

class CodecSpec extends AnyFunSuite {

  private def genList(maxLen: Int): Gen[Array[Posting]] =
    for {
      n <- Gen.chooseNum(0, maxLen)
      gaps <- Gen.listOfN(n, Gen.chooseNum(1, 50))
      tfs <- Gen.listOfN(n, Gen.chooseNum(1, 200))
      dls <- Gen.listOfN(n, Gen.chooseNum(1, 5000))
    } yield {
      val locals = gaps.scanLeft(-1)(_ + _).tail
      locals.lazyZip(tfs).lazyZip(dls).map(Posting.apply).toArray
    }

  private def samples(g: Gen[Array[Posting]], n: Int): Seq[Array[Posting]] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("round-trip: decodeAll(encode(x)) == x (property)") {
    for (ps <- samples(genList(600), 120)) {
      assert(Codec.decodeAll(Codec.encode(ps)).toSeq == ps.toSeq)
    }
  }

  test("round-trip at block boundaries") {
    for (n <- Seq(0, 1, 2, 127, 128, 129, 255, 256, 257, 384)) {
      val ps = Array.tabulate(n)(i => Posting(i * 3 + 1, i % 7 + 1, i % 100 + 10))
      assert(Codec.decodeAll(Codec.encode(ps)).toSeq == ps.toSeq)
    }
  }

  test("advanceTo matches linear scan semantics (property)") {
    for ((ps, si) <- samples(genList(600), 60).zipWithIndex if ps.nonEmpty) {
      val bytes = Codec.encode(ps)
      val maxL = ps.last.local
      val targetsG = Gen.listOfN(40, Gen.chooseNum(0, maxL + 10))
      val targets = targetsG.apply(Gen.Parameters.default, Seed(1000L + si)).get
        .sorted // iterator is forward-only
      val it = new Codec.Iter(bytes)
      for (t <- targets) {
        val expected = ps.find(_.local >= t)
        val ok = it.advanceTo(t)
        expected match {
          case Some(p) =>
            assert(ok, s"advanceTo($t) returned false, expected ${p.local}")
            assert(it.curLocal == p.local && it.curTf == p.tf && it.curDl == p.dl)
          case None =>
            assert(!ok, s"advanceTo($t) returned true past end")
        }
        if (!ok) assert(it.exhausted)
      }
    }
  }

  test("interleave next() and advanceTo()") {
    val ps = Array.tabulate(1000)(i => Posting(i * 2, i % 9 + 1, 100 + i % 50))
    val it = new Codec.Iter(Codec.encode(ps))
    assert(it.advanceTo(500) && it.curLocal == 500)
    assert(it.next() && it.curLocal == 502)
    assert(it.advanceTo(503) && it.curLocal == 504)
    assert(it.advanceTo(1998) && it.curLocal == 1998)
    assert(!it.next() && it.exhausted)
  }

  test("block metadata are true per-block extrema") {
    for (ps <- samples(genList(600), 30) if ps.nonEmpty) {
      val it = new Codec.Iter(Codec.encode(ps))
      // walk block by block: at each posting the block meta must bound it
      var go = !it.exhausted
      while (go) {
        assert(it.curTf <= it.blockMaxTf)
        assert(it.curDl >= it.blockMinDl)
        assert(it.curLocal <= it.blockLast)
        go = it.next()
      }
    }
  }

  test("compression: dense ascending lists take ~4 bytes/posting") {
    // delta=1 (1B) + tf<128 (1B) + dl in [128,16384) (2B) + block headers
    val ps = Array.tabulate(100000)(i => Posting(i, 1 + i % 3, 120 + i % 40))
    val bytes = Codec.encode(ps)
    assert(bytes.length.toDouble / ps.length < 4.3, s"${bytes.length} bytes")
  }
}
