package graft.multimodal

/** Pure-JVM GIF87a codec — the SECOND compressed-codec family of the
  * multimodal pipeline (round-13 verdict ask #8 / round-14 ask #4):
  * where PNG is DEFLATE-shaped (LZ77 + Huffman, which `java.util.zip`
  * supplies), GIF is LZW with VARIABLE-WIDTH codes — a dictionary coder
  * the JVM has no primitive for, so BOTH directions are implemented
  * from the public spec (CompuServe GIF87a, 1987; LZW per Welch 1984
  * with the GIF conventions): LSB-first bit packing, per-stream
  * clear/end-of-information codes, code width growing 9 → 12 bits as
  * the table fills, table reset at 4096 entries, 255-byte-max data
  * sub-blocks, and the 4-pass row interlace.
  *
  * Scope is the fixture profile the queries generate — one image, a
  * 256-entry global color table, no extensions — with everything a real
  * ingest decoder must still do on that profile: signature check,
  * logical-screen/image-descriptor parse, palette load, sub-block walk,
  * full variable-width LZW expansion with the KwKwK case, de-interlace,
  * palette-to-RGB resolve.
  *
  * Failure classes are genuine format failures, detected in the order a
  * streaming decoder meets them and routed to the quarantine channel:
  * bad_signature, unsupported (profile outside scope), truncated (any
  * structure or the code stream overruns the payload — the
  * partial-download corruption), bad_code (an LZW code beyond the
  * decoder's table — corrupt data; includes a non-literal first code
  * after clear).
  *
  * The width-synchronization subtlety, stated explicitly because it is
  * THE classic GIF-LZW off-by-one: the decoder is always one table
  * entry BEHIND the encoder (it learns entry n only while processing
  * the code after the one that created it), so the decoder widens when
  * ITS nextCode reaches 2^w, while the encoder must widen when its
  * just-assigned code equals 2^w — one emission later than its own
  * table size suggests. `MultimodalSpec` pins the agreement empirically
  * across both growth boundaries and the 4096 reset.
  */
object Gif {

  /** Decoded image: RGB raster (3·w·h bytes, row-major, de-interlaced). */
  final case class Decoded(width: Int, height: Int, interlaced: Boolean,
      raster: Array[Byte])

  val ClearCode = 256
  val EoiCode = 257
  val FirstFree = 258
  val MaxCodeWidth = 12
  val TableLimit = 4096

  val Signature87: Array[Byte] = "GIF87a".getBytes("US-ASCII")

  /** Row emission order of the GIF 4-pass interlace for height h
    * (pass starts/steps 0/8, 4/8, 2/4, 1/2).
    */
  def interlaceOrder(h: Int): Array[Int] = {
    val passes = Seq((0, 8), (4, 8), (2, 4), (1, 2))
    passes.flatMap { case (s, st) => s until h by st }.toArray
  }

  // --------------------------------------------------- LSB-first bitstream

  private final class BitWriter {
    private val bytes = scala.collection.mutable.ArrayBuffer[Byte]()
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= (code.toLong & ((1L << width) - 1)) << nbits
      nbits += width
      while (nbits >= 8) {
        bytes += (acc & 0xff).toByte; acc >>>= 8; nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) { bytes += (acc & 0xff).toByte; nbits = 0; acc = 0 }
      bytes.toArray
    }
  }

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var acc = 0L
    private var nbits = 0
    /** Next `width`-bit code, or -1 when the stream is exhausted. */
    def read(width: Int): Int = {
      while (nbits < width) {
        if (pos >= data.length) return -1
        acc |= (data(pos) & 0xffL) << nbits
        pos += 1; nbits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nbits -= width
      v
    }
  }

  // ------------------------------------------------------------------ LZW

  /** GIF-variant LZW compression of 8-bit symbols. `badCodeAt >= 1`
    * injects an out-of-range code ((2^width)−1, always beyond the
    * young table) after that many data codes — the fixture generator's
    * deterministic bit-rot class, which the DECODER must refuse.
    */
  private[multimodal] def lzwEncode(data: Array[Byte],
      badCodeAt: Int = -1): Array[Byte] = {
    val bw = new BitWriter
    var width = 9
    var nextCode = FirstFree
    val dict = new java.util.HashMap[Integer, Integer]()
    var emitted = 0
    def emit(code: Int): Unit = {
      bw.put(code, width)
      emitted += 1
      if (emitted == badCodeAt) bw.put((1 << width) - 1, width)
    }
    bw.put(ClearCode, width)
    var cur = -1
    var i = 0
    while (i < data.length) {
      val k = data(i) & 0xff
      if (cur < 0) cur = k
      else {
        val key = Integer.valueOf((cur << 8) | k)
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue
        else {
          emit(cur)
          if (nextCode == TableLimit) {
            // table full: reset, exactly as the decoder's frozen table
            // expects (it stopped adding one entry earlier — see the
            // off-by-one note in the object doc; the unused slack entry
            // is never emitted)
            bw.put(ClearCode, width)
            dict.clear(); nextCode = FirstFree; width = 9
          } else {
            dict.put(key, Integer.valueOf(nextCode))
            nextCode += 1
            // widen ONE emission later than table size suggests: the
            // decoder only learns this entry with the NEXT code
            if (nextCode - 1 == (1 << width) && width < MaxCodeWidth)
              width += 1
          }
          cur = k
        }
      }
      i += 1
    }
    if (cur >= 0) emit(cur)
    bw.put(EoiCode, width)
    bw.finish()
  }

  /** GIF-variant LZW expansion to exactly `n` 8-bit symbols. Left = the
    * failure class; tolerates a frozen table at 4096 until a clear.
    */
  private[multimodal] def lzwDecode(packed: Array[Byte],
      n: Int): Either[String, Array[Byte]] = {
    val br = new BitReader(packed)
    val out = new Array[Byte](n)
    var filled = 0
    // table as (prefix code, suffix byte); literals are implicit
    val prefix = new Array[Int](TableLimit)
    val suffix = new Array[Byte](TableLimit)
    var nextCode = FirstFree
    var width = 9
    var prev = -1
    val stack = new Array[Byte](TableLimit + 1)
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= FirstFree) c = prefix(c)
      c.toByte
    }
    def expand(code: Int, extra: Int): Either[String, Unit] = {
      var sp = 0
      if (extra >= 0) { stack(sp) = extra.toByte; sp += 1 }
      var c = code
      while (c >= FirstFree) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      stack(sp) = c.toByte; sp += 1
      if (filled + sp > n) return Left("bad_code") // raster overrun
      while (sp > 0) { sp -= 1; out(filled) = stack(sp); filled += 1 }
      Right(())
    }
    while (true) {
      val code = br.read(width)
      if (code < 0)
        return Left("truncated") // stream ended before EOI
      else if (code == ClearCode) {
        nextCode = FirstFree; width = 9; prev = -1
      } else if (code == EoiCode) {
        return if (filled == n) Right(out) else Left("truncated")
      } else if (prev < 0) {
        // first code after clear must be a literal
        if (code >= 256) return Left("bad_code")
        if (filled >= n) return Left("bad_code")
        out(filled) = code.toByte; filled += 1
        prev = code
      } else {
        val defined = code < 256 || (code >= FirstFree && code < nextCode)
        if (defined) {
          expand(code, -1) match {
            case Left(e) => return Left(e); case Right(_) =>
          }
        } else if (code == nextCode && nextCode < TableLimit) {
          // KwKwK: the entry being defined right now
          expand(prev, firstByte(prev) & 0xff) match {
            case Left(e) => return Left(e); case Right(_) =>
          }
        } else return Left("bad_code")
        if (nextCode < TableLimit) {
          prefix(nextCode) = prev
          suffix(nextCode) = firstByte(code)
          nextCode += 1
          if (nextCode == (1 << width) && width < MaxCodeWidth) width += 1
        }
        prev = code
      }
    }
    Left("truncated") // unreachable
  }

  // -------------------------------------------------------------- encoder

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Encode an 8-bit index raster (w·h bytes, row-major) plus a 256×RGB
    * palette as a valid GIF87a file. `interlaced` writes rows in the
    * 4-pass order; `blockSize` sets the data sub-block size (≤ 255 —
    * varying it exercises the decoder's sub-block walk); `badCodeAt`
    * forwards to [[lzwEncode]]'s corruption hook.
    */
  def encode(w: Int, h: Int, indices: Array[Byte], palette: Array[Byte],
      interlaced: Boolean = false, blockSize: Int = 255,
      badCodeAt: Int = -1): Array[Byte] = {
    require(indices.length == w * h, "raster size mismatch")
    require(palette.length == 768, "palette must be 256 RGB entries")
    require(blockSize >= 1 && blockSize <= 255, "sub-block size 1..255")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature87)
    out.write(u16le(w)); out.write(u16le(h))
    // packed: GCT present (0x80) | color resolution 8 (0x70) | GCT size
    // 256 entries (0x07)
    out.write(0xf7); out.write(0); out.write(0)
    out.write(palette)
    out.write(0x2c) // image descriptor
    out.write(u16le(0)); out.write(u16le(0))
    out.write(u16le(w)); out.write(u16le(h))
    out.write(if (interlaced) 0x40 else 0x00)
    out.write(8) // LZW minimum code size (8-bit palette)
    val stream =
      if (!interlaced) indices
      else {
        val reordered = new Array[Byte](indices.length)
        val order = interlaceOrder(h)
        var r = 0
        while (r < h) {
          System.arraycopy(indices, order(r) * w, reordered, r * w, w)
          r += 1
        }
        reordered
      }
    val packed = lzwEncode(stream, badCodeAt)
    var off = 0
    while (off < packed.length) {
      val len = math.min(blockSize, packed.length - off)
      out.write(len)
      out.write(packed, off, len)
      off += len
    }
    out.write(0x00) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // -------------------------------------------------------------- decoder

  private final class ByteReader(b: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      if (pos >= b.length) throw Truncated
      val v = b(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = u8() | (u8() << 8)
    def take(n: Int): Array[Byte] = {
      if (pos + n > b.length) throw Truncated
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n; out
    }
  }

  private object Truncated extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Decode a GIF87a payload of [[encode]]'s profile to an RGB raster.
    * Left = failure class (object doc).
    */
  def decode(bytes: Array[Byte]): Either[String, Decoded] =
    try {
      val r = new ByteReader(bytes)
      if (bytes.length < 6 ||
          !java.util.Arrays.equals(r.take(6), Signature87))
        return Left("bad_signature")
      val sw = r.u16(); val sh = r.u16()
      val packedLsd = r.u8()
      r.u8(); r.u8() // background index, aspect
      if ((packedLsd & 0x80) == 0 || (packedLsd & 0x07) != 0x07)
        return Left("unsupported") // profile: 256-entry global table
      val palette = r.take(768)
      if (r.u8() != 0x2c) return Left("unsupported") // extensions off-scope
      r.u16(); r.u16() // image left, top
      val w = r.u16(); val h = r.u16()
      if (w != sw || h != sh || w <= 0 || h <= 0) return Left("unsupported")
      val packedId = r.u8()
      if ((packedId & 0x80) != 0) return Left("unsupported") // local table
      val interlaced = (packedId & 0x40) != 0
      if (r.u8() != 8) return Left("unsupported") // LZW min code size
      // sub-block walk: concatenate data blocks up to the 0 terminator
      val data = new java.io.ByteArrayOutputStream()
      var len = r.u8()
      while (len != 0) {
        data.write(r.take(len))
        len = r.u8()
      }
      lzwDecode(data.toByteArray, w * h).map { idx =>
        val stream =
          if (!interlaced) idx
          else {
            val nat = new Array[Byte](idx.length)
            val order = interlaceOrder(h)
            var rr = 0
            while (rr < h) {
              System.arraycopy(idx, rr * w, nat, order(rr) * w, w)
              rr += 1
            }
            nat
          }
        val rgb = new Array[Byte](3 * w * h)
        var k = 0
        while (k < stream.length) {
          val j = (stream(k) & 0xff) * 3
          rgb(3 * k) = palette(j)
          rgb(3 * k + 1) = palette(j + 1)
          rgb(3 * k + 2) = palette(j + 2)
          k += 1
        }
        Decoded(w, h, interlaced, rgb)
      }
    } catch { case Truncated => Left("truncated") }
}
