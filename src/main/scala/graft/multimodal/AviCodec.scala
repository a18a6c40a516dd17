package graft.multimodal

import java.awt.image.BufferedImage

/** Minimal RIFF/AVI container codec on pure JVM — the round-13 close
  * of the last multimodal fallback (VERDICT r12 item 2 / "what's
  * missing"): q_multimodal_frames previously byte-block-sampled any
  * non-GIF video payload; real crawl video arrives in containers, and
  * the two classic AVI video stream encodings are both decodable with
  * nothing but the JDK — 'MJPG' (each frame chunk IS a JPEG, handed
  * to ImageIO) and 'DIB ' (uncompressed bottom-up BGR bitmaps, a
  * byte-layout walk). Same design rules as ImageCodec/GifCodec:
  * signature-gated, failure-tolerant decode (ANY structural anomaly —
  * truncated chunk, bogus size, undecodable frame — degrades the file
  * to the caller's byte-block fallback, never kills the job), and a
  * deterministic encoder so fixtures are real AVI files with known
  * ground truth (DIB is lossless, so specs assert exact pixels; MJPEG
  * asserts JPEG-tolerance bounds).
  *
  * Layout written (and the subset read): RIFF('AVI ') → LIST(hdrl){
  * avih, LIST(strl){strh, strf=BITMAPINFOHEADER} } → LIST(movi){
  * '00dc'|'00db' per frame } → idx1. The reader walks chunks
  * recursively and trusts only strf (for DIB geometry) and the movi
  * payloads — headers lie in the wild; sizes are bounds-checked
  * against the buffer at every step.
  */
private[multimodal] object AviCodec {

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes.length > 12 &&
      new String(bytes, 0, 4, Ascii) == "RIFF" &&
      new String(bytes, 8, 4, Ascii) == "AVI "

  // ---------------------------------------------------------------- read

  /** All video frames of an AVI whose stream is MJPG or DIB; None on
    * any structural or frame-level defect (degrade, never throw). */
  def decodeFrames(bytes: Array[Byte]): Option[IndexedSeq[BufferedImage]] =
    if (!isAvi(bytes)) None
    else try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(p: Int): String =
        if (p + 4 > bytes.length) "" else new String(bytes, p, 4, Ascii)
      var dib: Option[(Int, Int)] = None // (width, height) from strf
      val frames = IndexedSeq.newBuilder[BufferedImage]
      var bad = false

      // generic chunk walk over [from, until); recurses into LISTs
      def walk(from: Int, until: Int): Unit = {
        var pos = from
        while (!bad && pos + 8 <= until) {
          val id = fourcc(pos)
          val size = bb.getInt(pos + 4)
          val dataStart = pos + 8
          if (size < 0 || dataStart + size > until) { bad = true; return }
          if (id == "LIST") {
            if (size < 4) { bad = true; return }
            walk(dataStart + 4, dataStart + size) // skip the list type
          } else if (id == "strf" && dib.isEmpty && size >= 40) {
            // BITMAPINFOHEADER: biWidth @+4, biHeight @+8, biBitCount
            // @+14, biCompression @+16 — geometry only needed for DIB
            val w = bb.getInt(dataStart + 4)
            val h = bb.getInt(dataStart + 8)
            val bpp = bb.getShort(dataStart + 14).toInt
            val comp = bb.getInt(dataStart + 16)
            if (comp == 0 && bpp == 24 && w > 0 && h > 0 &&
                w.toLong * h <= 64L * 1024 * 1024)
              dib = Some((w, h))
          } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
              (id.endsWith("dc") || id.endsWith("db"))) {
            val payload = java.util.Arrays.copyOfRange(
              bytes, dataStart, dataStart + size)
            val frame =
              if (ImageCodec.isJpeg(payload)) ImageCodec.decode(payload)
              else dib.flatMap { case (w, h) => decodeDib(payload, w, h) }
            frame match {
              case Some(img) => frames += img
              case None => bad = true
            }
          }
          pos = dataStart + size + (size & 1) // chunks pad to even
        }
      }

      val riffSize = bb.getInt(4)
      val end = math.min(bytes.length.toLong, 8L + riffSize).toInt
      walk(12, end)
      val out = frames.result()
      if (bad || out.isEmpty) None else Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Bottom-up 24-bit BGR rows, 4-byte row padding (BI_RGB). */
  private def decodeDib(payload: Array[Byte], w: Int,
      h: Int): Option[BufferedImage] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    if (payload.length < rowBytes.toLong * h) return None
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val src = (h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val o = src + x * 3
        val b = payload(o) & 0xff
        val g = payload(o + 1) & 0xff
        val r = payload(o + 2) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    Some(img)
  }

  // --------------------------------------------------------------- write

  /** MJPEG-in-AVI: each frame stored as one ImageIO-encoded JPEG in a
    * '00dc' chunk (deterministic for a given JVM, like every other
    * re-encode in this package; JPEG is lossy — specs bound pixel
    * error rather than asserting equality). */
  def encodeMjpeg(frames: Seq[BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val payloads = frames.map { f =>
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(ImageCodec.toRgb(f), "jpg", out)
      out.toByteArray
    }
    assemble(frames.head.getWidth, frames.head.getHeight,
      handler = "MJPG", compression = 0x47504a4d /* 'MJPG' LE */,
      chunkId = "00dc", payloads)
  }

  /** Uncompressed DIB AVI ('00db' BI_RGB chunks) — LOSSLESS, so a
    * decode round-trip reproduces pixels exactly (the fixture path
    * for exact ground-truth assertions). */
  def encodeDib(frames: Seq[BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val payloads = frames.map { f =>
      val rgb = ImageCodec.toRgb(f)
      val out = new Array[Byte](rowBytes * h)
      var y = 0
      while (y < h) {
        val dst = (h - 1 - y) * rowBytes
        var x = 0
        while (x < w) {
          val p = rgb.getRGB(x, y)
          val o = dst + x * 3
          out(o) = (p & 0xff).toByte
          out(o + 1) = ((p >> 8) & 0xff).toByte
          out(o + 2) = ((p >> 16) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out: Array[Byte]
    }
    assemble(w, h, handler = "DIB ", compression = 0 /* BI_RGB */,
      chunkId = "00db", payloads)
  }

  private def assemble(w: Int, h: Int, handler: String, compression: Int,
      chunkId: String, payloads: Seq[Array[Byte]]): Array[Byte] = {
    val le = new LeBuilder
    val maxPayload = payloads.map(_.length).max
    // LIST hdrl
    val avih = {
      val b = new LeBuilder
      b.int(100000); b.int(0); b.int(0); b.int(0x10 /* HASINDEX */)
      b.int(payloads.size); b.int(0); b.int(1); b.int(maxPayload)
      b.int(w); b.int(h); b.int(0); b.int(0); b.int(0); b.int(0)
      b.bytes
    }
    val strh = {
      val b = new LeBuilder
      b.cc("vids"); b.cc(handler); b.int(0); b.int(0) // flags, prio+lang
      b.int(0); b.int(1); b.int(10); b.int(0) // init, scale, rate=10fps, start
      b.int(payloads.size); b.int(maxPayload); b.int(-1); b.int(0)
      b.short(0); b.short(0); b.short(w.toShort); b.short(h.toShort)
      b.bytes
    }
    val strf = {
      val b = new LeBuilder
      b.int(40); b.int(w); b.int(h); b.short(1); b.short(24)
      b.int(compression); b.int(maxPayload); b.int(0); b.int(0)
      b.int(0); b.int(0)
      b.bytes
    }
    val strl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)
    // LIST movi + idx1 (offsets relative to the movi list's type word)
    val moviChunks = new java.io.ByteArrayOutputStream()
    val idx = new LeBuilder
    var off = 4
    payloads.foreach { p =>
      val c = chunk(chunkId, p)
      moviChunks.write(c)
      idx.cc(chunkId); idx.int(0x10 /* KEYFRAME */); idx.int(off)
      idx.int(p.length)
      off += c.length
    }
    val movi = list("movi", moviChunks.toByteArray)
    val body = hdrl ++ movi ++ chunk("idx1", idx.bytes)
    le.cc("RIFF"); le.int(body.length + 4); le.cc("AVI ")
    le.raw(body)
    le.bytes
  }

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val b = new LeBuilder
    b.cc(id); b.int(data.length); b.raw(data)
    if ((data.length & 1) == 1) b.raw(Array(0.toByte)) // even padding
    b.bytes
  }

  private def list(listType: String, children: Array[Byte]): Array[Byte] = {
    val b = new LeBuilder
    b.cc("LIST"); b.int(children.length + 4); b.cc(listType)
    b.raw(children)
    b.bytes
  }

  /** Little-endian byte assembler (RIFF is LE throughout). */
  private final class LeBuilder {
    private val out = new java.io.ByteArrayOutputStream()
    def int(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def short(v: Short): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def cc(s: String): Unit = out.write(s.getBytes(Ascii))
    def raw(b: Array[Byte]): Unit = out.write(b)
    def bytes: Array[Byte] = out.toByteArray
  }
}
