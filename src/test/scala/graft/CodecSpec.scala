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

  test("re-encode is canonical: encode(decodeAll(b)) == b, positions too (property)") {
    // the compaction kill-rewrite's pass-through emits ORIGINAL blobs for
    // term lists holding no killed doc where the decode path re-encodes —
    // byte-identity of the two paths rests on this canonicality
    for ((ps, i) <- samples(genList(600), 120).zipWithIndex) {
      val b = Codec.encode(ps)
      assert(java.util.Arrays.equals(Codec.encode(Codec.decodeAll(b)), b), s"sample $i")
      val posGen = Gen.listOfN(ps.length, Gen.chooseNum(1, 4))
        .apply(Gen.Parameters.default, Seed(i.toLong)).get
      val positions = ps.lazyZip(posGen).map { (p, extra) =>
        Array.iterate(1 + p.local % 5, math.max(p.tf, extra))(_ + 3)
      }.toArray
      val pb = Codec.encodePositions(ps, positions)
      assert(java.util.Arrays.equals(
        Codec.encodePositions(Codec.decodeAll(b), Codec.decodeAllPositions(b, pb)), pb),
        s"positions sample $i")
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

  // ---- positional side-blob ----------------------------------------------

  private def genPositions(ps: Array[Posting], seed: Long): Array[Array[Int]] = {
    val rnd = new scala.util.Random(seed)
    ps.map { p =>
      // tf strictly-ascending positions
      val gaps = Array.fill(p.tf)(1 + rnd.nextInt(40))
      gaps.scanLeft(rnd.nextInt(10))(_ + _).tail
    }
  }

  test("positions round-trip aligned with postings (property)") {
    for ((ps, i) <- samples(genList(600), 60).zipWithIndex) {
      val pos = genPositions(ps, 7000L + i)
      val post = Codec.encode(ps)
      val blob = Codec.encodePositions(ps, pos)
      val back = Codec.decodeAllPositions(post, blob)
      assert(back.length == pos.length)
      for (k <- ps.indices) assert(back(k).toSeq == pos(k).toSeq, s"entry $k")
    }
  }

  test("IterPos: advanceTo matches linear scan, positions included") {
    for ((ps, si) <- samples(genList(600), 40).zipWithIndex if ps.nonEmpty) {
      val pos = genPositions(ps, 9000L + si)
      val post = Codec.encode(ps)
      val blob = Codec.encodePositions(ps, pos)
      val maxL = ps.last.local
      val targets = Gen.listOfN(30, Gen.chooseNum(0, maxL + 5))
        .apply(Gen.Parameters.default, Seed(4000L + si)).get.sorted
      val it = new Codec.IterPos(post, blob)
      for (t <- targets) {
        val expectedIdx = ps.indexWhere(_.local >= t)
        val ok = it.advanceTo(t)
        if (expectedIdx >= 0) {
          val p = ps(expectedIdx)
          assert(ok && it.curLocal == p.local && it.curTf == p.tf && it.curDl == p.dl)
          assert(it.curPositions.toSeq == pos(expectedIdx).toSeq)
        } else assert(!ok && it.exhausted)
      }
    }
  }

  test("IterPos: block-boundary walks keep positions aligned") {
    for (n <- Seq(1, 127, 128, 129, 256, 300)) {
      val ps = Array.tabulate(n)(i => Posting(i * 2, i % 5 + 1, 50 + i % 9))
      val pos = ps.map(p => Array.tabulate(p.tf)(k => 3 * k + p.local % 4))
      val it = new Codec.IterPos(Codec.encode(ps), Codec.encodePositions(ps, pos))
      var i = 0
      var go = !it.exhausted
      while (go) {
        assert(it.curLocal == ps(i).local && it.curPositions.toSeq == pos(i).toSeq)
        i += 1
        go = it.next()
      }
      assert(i == n)
    }
  }

  test("encodePositions rejects positions shorter than tf") {
    val ps = Array(Posting(1, 2, 10))
    intercept[IllegalArgumentException] {
      Codec.encodePositions(ps, Array(Array(1)))
    }
  }

  test("positions beyond the tf clamp survive (self-counting runs)") {
    // a saturated tf (e.g. MaxTf-clamped) must NOT truncate positions:
    // the run stores its own count, so pf stays exact past the clamp
    val ps = Array(Posting(3, 2, 10), Posting(9, 1, 10))
    val pos = Array(Array(1, 5, 9, 14), Array(7)) // entry 0: 4 positions, tf 2
    val back = Codec.decodeAllPositions(Codec.encode(ps), Codec.encodePositions(ps, pos))
    assert(back(0).toSeq == Seq(1, 5, 9, 14))
    assert(back(1).toSeq == Seq(7))
  }

  test("compression: dense ascending lists take ~4 bytes/posting") {
    // delta=1 (1B) + tf<128 (1B) + dl in [128,16384) (2B) + block headers
    val ps = Array.tabulate(100000)(i => Posting(i, 1 + i % 3, 120 + i % 40))
    val bytes = Codec.encode(ps)
    assert(bytes.length.toDouble / ps.length < 4.3, s"${bytes.length} bytes")
  }
}
