package graft.index

import java.io.ByteArrayOutputStream

/** Delta-gap + varint (LEB128) posting-list codec with a 128-entry block
  * structure carrying skip + upper-bound metadata for block-max WAND.
  *
  * The reference leaves posting compression to Lucene (delta+vint inside
  * segment files — no plugin code); the north_rule makes it ours. Each
  * posting carries (localId, tf, dl): dl (doc length) is inlined so the
  * query path never joins a norms side-store — only the query terms' rows
  * ever leave the segment scan (SURVEY.md §7.4/§7.5; trade-off: ~1 extra
  * varint per posting vs Lucene's separate norms file, bought for a
  * narrower query read at 100 TB).
  *
  * Layout (all varints):
  *   numEntries, numBlocks
  *   repeat numBlocks times:
  *     firstLocalDelta   (from previous block's lastLocal; block 0: absolute)
  *     lastLocalDelta    (lastLocal - firstLocal)
  *     maxTf, minDl      (block score upper-bound inputs: tfNorm is
  *                        monotone up in tf, down in dl, so
  *                        tfNorm(maxTf, minDl) bounds every entry)
  *     payloadLen (bytes)
  *     payload: numEntriesInBlock, then per entry (deltaLocal, tf, dl);
  *              the first entry's deltaLocal is from the block's firstLocal
  *              (i.e. 0).
  *
  * Entries must be strictly increasing in localId.
  */
object Codec {
  val BlockSize = 128

  final case class Posting(local: Int, tf: Int, dl: Int)

  def writeVarInt(out: ByteArrayOutputStream, v0: Int): Unit = {
    var v = v0
    require(v >= 0, s"varint must be non-negative, got $v")
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
  }

  def writeVarInt(out: ByteBuf, v0: Int): Unit = {
    var v = v0
    require(v >= 0, s"varint must be non-negative, got $v")
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
  }

  final class Reader(val bytes: Array[Byte], var pos: Int = 0) {
    def readVarInt(): Int = {
      var v = 0; var shift = 0; var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7f) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
  }

  /** Encode a strictly-ascending posting list. */
  def encode(postings: Array[Posting]): Array[Byte] = {
    // ByteBuf, not ByteArrayOutputStream: BAOS.write is synchronized per
    // byte — at 8 build threads the varint writes were ~9% of task CPU
    // (JFR); the payload scratch is reused across blocks
    val out = new ByteBuf(postings.length * 3 + 16)
    val payload = new ByteBuf(math.min(postings.length, BlockSize) * 3 + 4)
    val nBlocks = (postings.length + BlockSize - 1) / BlockSize
    writeVarInt(out, postings.length)
    writeVarInt(out, nBlocks)
    var prevBlockLast = 0
    var b = 0
    while (b < nBlocks) {
      val from = b * BlockSize
      val until = math.min(from + BlockSize, postings.length)
      val first = postings(from).local
      val last = postings(until - 1).local
      var maxTf = 0
      var minDl = Int.MaxValue
      payload.reset()
      writeVarInt(payload, until - from)
      var prev = first
      var i = from
      while (i < until) {
        val p = postings(i)
        require(i == from || p.local > prev, "postings must be strictly ascending")
        writeVarInt(payload, p.local - (if (i == from) first else prev))
        writeVarInt(payload, p.tf)
        writeVarInt(payload, p.dl)
        if (p.tf > maxTf) maxTf = p.tf
        if (p.dl < minDl) minDl = p.dl
        prev = p.local
        i += 1
      }
      writeVarInt(out, first - prevBlockLast)
      writeVarInt(out, last - first)
      writeVarInt(out, maxTf)
      writeVarInt(out, minDl)
      writeVarInt(out, payload.size)
      out.append(payload)
      prevBlockLast = last
      b += 1
    }
    out.toByteArray
  }

  /** Decode the full list (test/merge path; the query path uses [[Iter]]). */
  def decodeAll(bytes: Array[Byte]): Array[Posting] = {
    val it = new Iter(bytes)
    val res = new Array[Posting](it.numEntries)
    var k = 0
    while (!it.exhausted) {
      res(k) = Posting(it.curLocal, it.curTf, it.curDl)
      k += 1
      it.next()
    }
    assert(k == res.length, s"decoded $k of ${res.length}")
    res
  }

  // ---- positional side-blob (phrase queries) ----------------------------
  //
  // Term positions are stored NEXT TO the postings blob, never inside it:
  // the postings codec (and every BM25/WAND consumer of it) is unchanged,
  // and the positions bytes live in their own nullable parquet column that
  // non-phrase queries never read. The blob mirrors the postings blob's
  // block structure so a block skipped by the leapfrog skips its position
  // payload with one varint read:
  //
  //   repeat numBlocks times:
  //     posPayloadLen (varint)
  //     payload: per entry, in the block's entry order:
  //              numPositions (varint), then numPositions varints —
  //              first = absolute token position, rest = gaps
  //              (positions strictly ascending)
  //
  // Entry alignment is by construction: entry i of the postings blob owns
  // the i-th (count, run) of its block's payload. The count is stored
  // (one varint per entry) rather than derived from the posting's tf so
  // the MaxTf saturation of the packed tf cannot TRUNCATE positions — a
  // pathological doc repeating a phrase word beyond the clamp still
  // phrase-matches exactly (pf comes from positions; BM25's tf stays
  // saturating by design).
  // Reference anchor: Lucene's .prx/.pos positional postings backing the
  // host platform's PhraseQuery surface (SURVEY.md §2.11, lire.html:83).

  /** Encode the positions blob for an already-encoded posting list.
    * `positions(i)` are the strictly-ascending token positions of
    * `postings(i)` — at least tf entries (tf saturates at the pack clamp,
    * positions never do).
    */
  def encodePositions(postings: Array[Posting], positions: Array[Array[Int]]): Array[Byte] = {
    require(postings.length == positions.length,
      s"postings/positions length mismatch: ${postings.length} vs ${positions.length}")
    val out = new ByteBuf(postings.length * 4 + 16)
    val payload = new ByteBuf(math.min(postings.length, BlockSize) * 4 + 4)
    val nBlocks = (postings.length + BlockSize - 1) / BlockSize
    var b = 0
    while (b < nBlocks) {
      val from = b * BlockSize
      val until = math.min(from + BlockSize, postings.length)
      payload.reset()
      var i = from
      while (i < until) {
        val ps = positions(i)
        require(ps.length >= postings(i).tf,
          s"positions(${i}).length=${ps.length} < tf=${postings(i).tf}")
        writeVarInt(payload, ps.length)
        var k = 0
        var prev = 0
        while (k < ps.length) {
          writeVarInt(payload, ps(k) - prev)
          prev = ps(k)
          k += 1
        }
        i += 1
      }
      writeVarInt(out, payload.size)
      out.append(payload)
      b += 1
    }
    out.toByteArray
  }

  /** Decode the full positions blob aligned with [[decodeAll]]'s order
    * (merge/test path; the query path uses [[IterPos]]).
    */
  def decodeAllPositions(postBytes: Array[Byte], posBytes: Array[Byte]): Array[Array[Int]] = {
    val it = new IterPos(postBytes, posBytes)
    val res = new Array[Array[Int]](it.numEntries)
    var k = 0
    while (!it.exhausted) {
      res(k) = it.curPositions
      k += 1
      it.next()
    }
    assert(k == res.length, s"decoded $k of ${res.length}")
    res
  }

  /** Block-skipping iterator over postings + their positions blob, in
    * lockstep: a block skipped by `advanceTo` costs one postings header
    * read plus ONE position-payload-length varint — no position bytes of
    * skipped blocks are touched. Exposes `curPositions` for the entry the
    * cursor is on (decoded lazily per landed block).
    */
  final class IterPos(postBytes: Array[Byte], posBytes: Array[Byte]) {
    private val r = new Reader(postBytes)
    private val pr = new Reader(posBytes)
    val numEntries: Int = r.readVarInt()
    private val numBlocks: Int = r.readVarInt()
    private var blockIdx = -1
    private var prevLast = 0
    private var bFirst = 0
    private var bLast = 0
    private var payloadPending = false
    private val locals = new Array[Int](BlockSize)
    private val tfs = new Array[Int](BlockSize)
    private val dls = new Array[Int](BlockSize)
    private val poss = new Array[Array[Int]](BlockSize)
    private var blockCnt = 0
    private var inBlock = 0
    var exhausted: Boolean = numEntries == 0

    def curLocal: Int = locals(inBlock)
    def curTf: Int = tfs(inBlock)
    def curDl: Int = dls(inBlock)
    def curPositions: Array[Int] = poss(inBlock)

    private def advanceBlock(): Boolean = {
      if (payloadPending) {
        val len = r.readVarInt(); r.pos += len
        val plen = pr.readVarInt(); pr.pos += plen
        payloadPending = false
      }
      if (blockIdx + 1 >= numBlocks) { exhausted = true; false }
      else {
        if (blockIdx >= 0) prevLast = bLast
        blockIdx += 1
        bFirst = prevLast + r.readVarInt()
        bLast = bFirst + r.readVarInt()
        r.readVarInt() // maxTf (unused here)
        r.readVarInt() // minDl (unused here)
        payloadPending = true
        true
      }
    }

    private def decodePayload(): Unit = {
      r.readVarInt() // payloadLen
      blockCnt = r.readVarInt()
      var prev = bFirst
      var i = 0
      while (i < blockCnt) {
        val l = (if (i == 0) bFirst else prev) + r.readVarInt()
        locals(i) = l; tfs(i) = r.readVarInt(); dls(i) = r.readVarInt()
        prev = l
        i += 1
      }
      pr.readVarInt() // posPayloadLen
      i = 0
      while (i < blockCnt) {
        val cnt = pr.readVarInt()
        val arr = new Array[Int](cnt)
        var p = 0
        var k = 0
        while (k < cnt) { p += pr.readVarInt(); arr(k) = p; k += 1 }
        poss(i) = arr
        i += 1
      }
      inBlock = 0
      payloadPending = false
    }

    if (!exhausted) { advanceBlock(); decodePayload() }

    /** Position at the first posting with local >= target. */
    def advanceTo(target: Int): Boolean = {
      if (exhausted) return false
      if (!payloadPending && curLocal >= target) return true
      while (bLast < target) if (!advanceBlock()) return false
      if (payloadPending) decodePayload()
      while (locals(inBlock) < target) inBlock += 1 // safe: bLast >= target
      true
    }

    /** Step to the next posting. */
    def next(): Boolean = {
      if (exhausted) return false
      inBlock += 1
      if (inBlock < blockCnt) true
      else if (!advanceBlock()) false
      else { decodePayload(); true }
    }
  }

  /** Block-skipping iterator: `advanceTo(target)` positions at the first
    * posting with local >= target, decoding only the blocks it lands in
    * (a skipped block costs one header read + a byte-range seek).
    */
  final class Iter(bytes: Array[Byte]) {
    private val r = new Reader(bytes)
    val numEntries: Int = r.readVarInt()
    private val numBlocks: Int = r.readVarInt()
    private var blockIdx = -1
    private var prevLast = 0 // lastLocal of the block before the current one
    private var bFirst = 0
    private var bLast = 0
    private var bMaxTf = 0
    private var bMinDl = 0
    private var payloadPending = false
    private val locals = new Array[Int](BlockSize)
    private val tfs = new Array[Int](BlockSize)
    private val dls = new Array[Int](BlockSize)
    private var blockCnt = 0
    private var inBlock = 0
    var exhausted: Boolean = numEntries == 0

    def curLocal: Int = locals(inBlock)
    def curTf: Int = tfs(inBlock)
    def curDl: Int = dls(inBlock)
    def blockLast: Int = bLast
    def blockMaxTf: Int = bMaxTf
    def blockMinDl: Int = bMinDl

    /** Move to the next block header (skipping an undecoded payload). */
    private def advanceBlock(): Boolean = {
      if (payloadPending) { val len = r.readVarInt(); r.pos += len; payloadPending = false }
      if (blockIdx + 1 >= numBlocks) { exhausted = true; false }
      else {
        if (blockIdx >= 0) prevLast = bLast
        blockIdx += 1
        bFirst = prevLast + r.readVarInt()
        bLast = bFirst + r.readVarInt()
        bMaxTf = r.readVarInt()
        bMinDl = r.readVarInt()
        payloadPending = true
        true
      }
    }

    private def decodePayload(): Unit = {
      r.readVarInt() // payloadLen
      blockCnt = r.readVarInt()
      var prev = bFirst
      var i = 0
      while (i < blockCnt) {
        val l = (if (i == 0) bFirst else prev) + r.readVarInt()
        locals(i) = l; tfs(i) = r.readVarInt(); dls(i) = r.readVarInt()
        prev = l
        i += 1
      }
      inBlock = 0
      payloadPending = false
    }

    if (!exhausted) { advanceBlock(); decodePayload() }

    /** Position at the first posting with local >= target. */
    def advanceTo(target: Int): Boolean = {
      if (exhausted) return false
      if (!payloadPending && curLocal >= target) return true
      while (bLast < target) if (!advanceBlock()) return false
      if (payloadPending) decodePayload()
      while (locals(inBlock) < target) inBlock += 1 // safe: bLast >= target
      true
    }

    /** Step to the next posting. */
    def next(): Boolean = {
      if (exhausted) return false
      inBlock += 1
      if (inBlock < blockCnt) true
      else if (!advanceBlock()) false
      else { decodePayload(); true }
    }
  }
}

/** Growable unsynchronized byte buffer (build hot path). Replaces
  * ByteArrayOutputStream in the codec encoders and the map-side position
  * streams: BAOS synchronizes every single-byte write — with JDK 17's
  * biased locking removed that is a real CAS per varint byte, and the
  * encoders write billions of them per build (JFR: ~9% of build task CPU).
  */
private[graft] final class ByteBuf(initial: Int = 32) {
  private var a = new Array[Byte](math.max(8, initial))
  private var n = 0
  def write(b: Int): Unit = {
    if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
    a(n) = b.toByte; n += 1
  }
  def append(other: ByteBuf): Unit = {
    if (n + other.n > a.length)
      a = java.util.Arrays.copyOf(a, math.max(n + other.n, a.length * 2))
    System.arraycopy(other.a, 0, a, n, other.n); n += other.n
  }
  def size: Int = n
  def reset(): Unit = n = 0
  def toByteArray: Array[Byte] =
    if (n == 0) Array.emptyByteArray else java.util.Arrays.copyOf(a, n)
}
