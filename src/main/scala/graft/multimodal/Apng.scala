package graft.multimodal

import java.util.zip.CRC32

/** Pure-JVM APNG (animated PNG) codec — the INTERNAL-FRAME container
  * slot of the multimodal pipeline (round-12 verdict ask #8): where
  * [[Png]] models the single-image compressed codec, this models the
  * container formats whose payload is a SEQUENCE of frames behind one
  * header (video/animation), so the frame-count and frame-sampling
  * queries exercise a REAL container parse — chunk walk, animation
  * control, per-frame control records, sequence-number validation, and
  * a full DEFLATE + unfilter decode of every frame — instead of a
  * hash-derived stand-in. Everything below acTL/fcTL/fdAT reuses the
  * [[Png]] machinery verbatim ([[Png.chunk]], [[Png.deflateRaster]],
  * [[Png.inflateRaster]]): an APNG frame's data stream IS a PNG image
  * stream, per the APNG specification (now PNG third edition §11.3.4).
  *
  * Scope matches [[Png]]'s profile (8-bit truecolor, non-interlaced)
  * plus the animation structure: acTL (frame count) after IHDR, the
  * first frame's fcTL before IDAT (every fixture frame participates in
  * the animation — no skipped default image), later frames as fcTL +
  * one-or-more fdAT chunks, one shared sequence counter across all
  * fcTL/fdAT chunks that must increment by exactly 1.
  *
  * Failure classes extend the PNG taxonomy with the container's own,
  * detected in decoder order and routed to quarantine, never thrown:
  * bad_actl (malformed or frame count that disagrees with the fcTL
  * walk — the metadata-lies corruption), bad_sequence (a sequence gap
  * or an fdAT with no owning fcTL — the reordered/dropped-chunk
  * corruption), bad_frame_rect (a frame rectangle outside the canvas),
  * plus every [[Png]] class (bad_signature, truncated, bad_crc,
  * bad_ihdr, unsupported, bad_deflate, truncated_idat, bad_filter).
  */
object Apng {

  /** One decoded animation frame: its index in play order, rectangle,
    * delay fraction, and the reconstructed RGB raster (3·w·h bytes).
    */
  final case class Frame(idx: Int, width: Int, height: Int,
      xOff: Int, yOff: Int, delayNum: Int, delayDen: Int,
      raster: Array[Byte])

  // ------------------------------------------------------------- encoder

  /** Encode full-canvas animation frames as a valid APNG.
    * `declaredFrames` overrides acTL's frame count (a mismatch is the
    * bad_actl fixture); `bumpLastSeq` adds 1 to the final fdAT's
    * sequence number WITH a correct CRC (the reordered-chunk fixture —
    * a stale CRC would be caught as bad_crc first); `splitFdat` emits
    * frame 1's stream as two fdAT chunks (real encoders chunk large
    * frames; decoders must concatenate).
    */
  def encode(w: Int, h: Int, frames: Seq[Array[Byte]],
      filterFor: (Int, Int) => Int = (f, r) => (f + r) % 5,
      declaredFrames: Option[Int] = None,
      bumpLastSeq: Boolean = false,
      splitFdat: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "an APNG carries at least one frame")
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    val actl = java.nio.ByteBuffer.allocate(8)
    actl.putInt(declaredFrames.getOrElse(frames.length)).putInt(0)
    var seq = 0
    def fctl(fw: Int, fh: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(26)
      b.putInt(seq).putInt(fw).putInt(fh).putInt(0).putInt(0)
        .putShort(1.toShort).putShort(10.toShort) // delay 1/10 s
        .put(0.toByte).put(0.toByte)              // dispose NONE, blend SOURCE
      seq += 1
      b.array()
    }
    def fdat(data: Array[Byte], bump: Boolean): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 + data.length)
      b.putInt(if (bump) seq + 1 else seq).put(data)
      seq += 1
      Png.chunk("fdAT", b.array())
    }
    val parts = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    parts += Png.Signature
    parts += Png.chunk("IHDR", ihdr.array())
    parts += Png.chunk("acTL", actl.array())
    frames.zipWithIndex.foreach { case (raster, f) =>
      val stream = Png.deflateRaster(w, h, raster, filterFor(f, _))
      parts += Png.chunk("fcTL", fctl(w, h))
      if (f == 0) parts += Png.chunk("IDAT", stream)
      else {
        val pieces =
          if (splitFdat && f == 1 && stream.length >= 2)
            Seq(java.util.Arrays.copyOfRange(stream, 0, stream.length / 2),
              java.util.Arrays.copyOfRange(stream, stream.length / 2,
                stream.length))
          else Seq(stream)
        val last = pieces.length - 1
        pieces.zipWithIndex.foreach { case (p, i) =>
          parts += fdat(p, bumpLastSeq && f == frames.length - 1 && i == last)
        }
      }
    }
    parts += Png.chunk("IEND", Array.emptyByteArray)
    val out = new Array[Byte](parts.map(_.length).sum)
    var off = 0
    parts.foreach { p =>
      System.arraycopy(p, 0, out, off, p.length); off += p.length
    }
    out
  }

  // ------------------------------------------------------------- decoder

  /** Full container decode: CRC'd chunk walk, acTL/fcTL/fdAT structure
    * validation (one shared sequence counter, increment-by-1), then a
    * complete DEFLATE + unfilter reconstruction of every frame. Returns
    * the frames in play order or the failure class.
    */
  def decode(png: Array[Byte]): Either[String, Vector[Frame]] = {
    if (png.length < 8 ||
        !java.util.Arrays.equals(java.util.Arrays.copyOf(png, 8),
          Png.Signature))
      return Left("bad_signature")
    var i = 8
    var w = -1; var h = -1
    var seenIhdr = false; var seenIend = false
    var declared = -1
    var expectSeq = 0
    // per-frame control + accumulated compressed stream, in play order
    final case class Ctl(fw: Int, fh: Int, fx: Int, fy: Int,
        dn: Int, dd: Int, data: java.io.ByteArrayOutputStream)
    val ctls = scala.collection.mutable.ArrayBuffer[Ctl]()
    while (!seenIend) {
      if (i + 8 > png.length) return Left("truncated")
      val len = java.nio.ByteBuffer.wrap(png, i, 4).getInt
      if (len < 0 || i + 12 + len.toLong > png.length) return Left("truncated")
      val typ = new String(png, i + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(png, i + 4, 4 + len)
      if (crc.getValue.toInt !=
          java.nio.ByteBuffer.wrap(png, i + 8 + len, 4).getInt)
        return Left("bad_crc")
      typ match {
        case "IHDR" =>
          if (len != 13) return Left("bad_ihdr")
          val bb = java.nio.ByteBuffer.wrap(png, i + 8, 13)
          w = bb.getInt; h = bb.getInt
          val bits = bb.get(); val color = bb.get()
          bb.get(); bb.get()
          val interlace = bb.get()
          if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20))
            return Left("bad_ihdr")
          if (bits != 8 || color != 2 || interlace != 0)
            return Left("unsupported")
          seenIhdr = true
        case "acTL" =>
          if (!seenIhdr || len != 8) return Left("bad_actl")
          declared = java.nio.ByteBuffer.wrap(png, i + 8, 4).getInt
          if (declared <= 0) return Left("bad_actl")
        case "fcTL" =>
          if (!seenIhdr || declared < 0 || len != 26)
            return Left("bad_actl")
          val bb = java.nio.ByteBuffer.wrap(png, i + 8, 26)
          val seq = bb.getInt
          if (seq != expectSeq) return Left("bad_sequence")
          expectSeq += 1
          val fw = bb.getInt; val fh = bb.getInt
          val fx = bb.getInt; val fy = bb.getInt
          val dn = bb.getShort & 0xffff; val dd = bb.getShort & 0xffff
          if (fw <= 0 || fh <= 0 || fx < 0 || fy < 0 ||
              fx.toLong + fw > w || fy.toLong + fh > h)
            return Left("bad_frame_rect")
          ctls += Ctl(fw, fh, fx, fy, dn, dd,
            new java.io.ByteArrayOutputStream())
        case "IDAT" =>
          // scope: every frame participates (first fcTL precedes IDAT);
          // a default-image-only IDAT is outside the fixture profile
          if (ctls.isEmpty) return Left("unsupported")
          ctls.head.data.write(png, i + 8, len)
        case "fdAT" =>
          if (len < 4) return Left("truncated")
          if (ctls.isEmpty) return Left("bad_sequence")
          val seq = java.nio.ByteBuffer.wrap(png, i + 8, 4).getInt
          if (seq != expectSeq) return Left("bad_sequence")
          expectSeq += 1
          ctls.last.data.write(png, i + 12, len - 4)
        case "IEND" => seenIend = true
        case _ => () // ancillary: CRC verified, content skipped
      }
      i += 12 + len
    }
    if (!seenIhdr) return Left("bad_ihdr")
    if (declared < 0 || ctls.length != declared) return Left("bad_actl")
    val out = Vector.newBuilder[Frame]
    ctls.zipWithIndex.foreach { case (c, f) =>
      Png.inflateRaster(c.data.toByteArray, c.fw, c.fh) match {
        case Left(err) => return Left(err)
        case Right(raster) =>
          out += Frame(f, c.fw, c.fh, c.fx, c.fy, c.dn, c.dd, raster)
      }
    }
    Right(out.result())
  }
}
