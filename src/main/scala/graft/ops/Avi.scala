package graft.ops

/** Dependency-free MJPEG-in-AVI video decoder (public container
  * format: Microsoft RIFF/AVI — 'RIFF…AVI ' header, LIST chunks, frame
  * chunks '##dc'/'##db' inside the 'movi' list; MJPEG = each frame
  * chunk is a complete baseline JPEG). Together with [[Jpeg]] this
  * turns the video half of the multimodal surface REAL for the one
  * codec that needs no codec library: frames decode through graft's
  * own JPEG decoder. Motion-compensated codecs (H.264/VP9/AV1…) remain
  * the declared out-of-scope stub — they require codec libraries this
  * container does not have.
  *
  * Fail-soft `None` outside the supported shape (dirty bytes at scale
  * must not kill an executor task): non-RIFF/AVI bytes, no movi list,
  * zero parseable JPEG frames, or a first frame [[Jpeg]] rejects.
  */
object Avi {

  /** Decoded video summary: frame COUNT is exact over the container up
    * to [[MAX_FRAMES]] (the scan saturates there — ~9.7 h at 30 fps);
    * only the FIRST frame is pixel-decoded (the keyframe features the
    * pipeline extracts) — a full-frame decode of every frame is the
    * caller's loop if it wants one.
    */
  final case class Video(width: Int, height: Int, frameCount: Int, first: Jpeg.Image)

  /** Frame-chunk scan cap: a forged header must not loop unboundedly. */
  val MAX_FRAMES = 1 << 20

  /** LIST nesting cap: real AVIs nest 2-3 deep (hdrl/movi/rec ); a
    * crafted chain of nested LISTs must not overflow the stack.
    */
  val MAX_DEPTH = 64

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0).toByte && b(i + 1) == s.charAt(1).toByte &&
      b(i + 2) == s.charAt(2).toByte && b(i + 3) == s.charAt(3).toByte

  def decode(bytes: Array[Byte]): Option[Video] =
    try decodeImpl(bytes)
    catch { case _: Exception | _: OutOfMemoryError | _: StackOverflowError => None }

  private def decodeImpl(b: Array[Byte]): Option[Video] = {
    if (b == null || b.length < 24) return None
    if (!fourcc(b, 0, "RIFF") || !fourcc(b, 8, "AVI ")) return None
    val end = math.min(b.length.toLong, 8L + (le32(b, 4) & 0xffffffffL)).toInt

    var frameCount = 0
    var firstOff = -1
    var firstLen = 0

    /** Walk a chunk range; `inMovi` marks ranges where '##dc'/'##db'
      * chunks are frames ('movi' and its nested 'rec ' lists).
      */
    def walk(from: Int, to: Int, inMovi: Boolean, depth: Int): Unit = {
      if (depth > MAX_DEPTH) return
      var pos = from
      while (pos + 8 <= to && frameCount < MAX_FRAMES) {
        val size = le32(b, pos + 4) & 0x7fffffff
        val dataStart = pos + 8
        // long arithmetic: a forged 2^31-ish size must not wrap negative
        // and slip past this truncation guard
        if (dataStart.toLong + size > to) return // truncated chunk: stop this range
        if (fourcc(b, pos, "LIST")) {
          if (size >= 4) {
            val isMovi = fourcc(b, dataStart, "movi") || fourcc(b, dataStart, "rec ")
            walk(dataStart + 4, dataStart + size, inMovi || isMovi, depth + 1)
          }
        } else if (inMovi && size > 0 &&
          b(pos) >= '0' && b(pos) <= '9' && b(pos + 1) >= '0' && b(pos + 1) <= '9' &&
          b(pos + 2) == 'd' && (b(pos + 3) == 'c' || b(pos + 3) == 'b')) {
          // a '##dc'/'##db' stream chunk — bytes 0-1 must be the ASCII
          // stream-number digits, else any movi chunk whose id happens
          // to end in dc/db with an SOI-prefixed payload would count
          // as a video frame; MJPEG frames start with SOI
          if (size >= 2 && (b(dataStart) & 0xff) == 0xff && (b(dataStart + 1) & 0xff) == 0xd8) {
            if (firstOff < 0) { firstOff = dataStart; firstLen = size }
            frameCount += 1
          }
        }
        pos = dataStart + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, end, inMovi = false, depth = 0)

    if (frameCount == 0 || firstOff < 0) return None
    val firstBytes = java.util.Arrays.copyOfRange(b, firstOff, firstOff + firstLen)
    Jpeg.decode(firstBytes).map(img => Video(img.width, img.height, frameCount, img))
  }

  /** Minimal MJPEG-AVI writer — FIXTURE/export helper (tests and the
    * oracled query build their videos with it around ImageIO-encoded
    * JPEG payloads; the decoder above never depends on it). Header
    * fields beyond dims/frame count are nominal.
    */
  def encode(frames: Seq[Array[Byte]], width: Int, height: Int): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val bo = new java.io.ByteArrayOutputStream()
    def le(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    // avih: MicroSecPerFrame..Reserved[4] = 14 u32 fields (56 bytes)
    val avih = new java.io.ByteArrayOutputStream()
    avih.write(le(33333)); avih.write(le(0)); avih.write(le(0)); avih.write(le(0x10))
    avih.write(le(frames.size)); avih.write(le(0)); avih.write(le(1)); avih.write(le(0))
    avih.write(le(width)); avih.write(le(height))
    for (_ <- 0 until 4) avih.write(le(0))
    val hdrl = new java.io.ByteArrayOutputStream()
    hdrl.write(cc("hdrl"))
    hdrl.write(cc("avih")); hdrl.write(le(avih.size)); hdrl.write(avih.toByteArray)

    val movi = new java.io.ByteArrayOutputStream()
    movi.write(cc("movi"))
    frames.foreach { f =>
      movi.write(cc("00dc")); movi.write(le(f.length)); movi.write(f)
      if ((f.length & 1) == 1) movi.write(0) // pad to word boundary
    }

    val body = new java.io.ByteArrayOutputStream()
    body.write(cc("AVI "))
    body.write(cc("LIST")); body.write(le(hdrl.size)); body.write(hdrl.toByteArray)
    body.write(cc("LIST")); body.write(le(movi.size)); body.write(movi.toByteArray)

    bo.write(cc("RIFF")); bo.write(le(body.size)); bo.write(body.toByteArray)
    bo.toByteArray
  }
}
