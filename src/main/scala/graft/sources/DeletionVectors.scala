package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}

/** Delta Lake deletion vectors — the merge-on-read row-suppression
  * channel, implemented from the published Delta Transaction Log Protocol
  * (github.com/delta-io/delta PROTOCOL.md §Deletion Vectors + the
  * RoaringFormatSpec at github.com/RoaringBitmap/RoaringFormatSpec); no
  * Delta or RoaringBitmap library.
  *
  * Three layers, each independently round-trippable:
  *
  *  1. '''Bitmap''': a set of deleted row indexes (positions in the data
  *     file) as a 64-bit "RoaringBitmapArray" in its portable form —
  *     magic `1681511377` (int32 LE), bitmap count (int64 LE), then per
  *     32-bit bucket a key (int32 LE) + a standard-format 32-bit roaring
  *     bitmap (cookie / descriptive headers / offsets / array|bitmap|run
  *     containers, all LE). The serializer emits array/bitmap containers
  *     under the no-run cookie (always legal); the deserializer also
  *     accepts run containers, so DVs written by real engines decode.
  *  2. '''File framing''': a DV file starts with a format-version byte
  *     (1); each vector within is `[size int32 BE][data][crc32 int32 BE]`
  *     — big-endian framing around little-endian bitmap internals, per
  *     the protocol (and delta-spark's DataOutputStream framing). The
  *     descriptor `offset` points at the size field.
  *  3. '''Descriptor''': `add.deletionVector` with storageType `u`
  *     (table-relative file named by a Z85/RFC1924-base85 UUID), `i`
  *     (bitmap inline, base85 in the descriptor itself) or `p` (absolute
  *     path).
  */
object DeletionVectors {

  /** `add.deletionVector` as the log stores it. */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
                              offset: Option[Int], sizeInBytes: Int,
                              cardinality: Long)

  // ---- Base85, RFC 1924 alphabet (the protocol's encoding) -------------

  private val B85 =
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz" +
      "!#$%&()*+-;<=>?@^_`{|}~"
  private val B85Rev: Array[Int] = {
    val t = Array.fill(128)(-1)
    B85.zipWithIndex.foreach { case (c, i) => t(c.toInt) = i }
    t
  }

  /** 4 bytes → 5 chars per block, MSB-first. Input not a multiple of 4 is
    * zero-padded; callers that need exact length decode with `outLen`. */
  def base85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ new Array[Byte](4 - bytes.length % 4)
    val sb = new java.lang.StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xffL); j += 1 }
      val digits = new Array[Char](5)
      j = 4
      while (j >= 0) { digits(j) = B85((v % 85).toInt); v /= 85; j -= 1 }
      sb.append(digits)
      i += 4
    }
    sb.toString
  }

  /** Inverse of [[base85Encode]]; `outLen` trims the zero padding. */
  def base85Decode(s: String, outLen: Int = -1): Array[Byte] = {
    require(s.length % 5 == 0, s"base85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) B85Rev(c.toInt) else -1
        require(d >= 0, s"invalid base85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    if (outLen < 0) out else java.util.Arrays.copyOf(out, outLen)
  }

  // ---- RoaringBitmapArray (64-bit), portable serialization -------------

  private val Magic = 1681511377
  private val CookieNoRun = 12346
  private val CookieRun = 12347
  private val ArrayMaxCard = 4096
  private val NoOffsetThreshold = 4

  /** Deleted row indexes (sorted, distinct, ≥ 0) → portable bytes. */
  def serialize(sortedIndexes: Array[Long]): Array[Byte] = {
    require(sortedIndexes.forall(_ >= 0), "row indexes must be non-negative")
    val byHigh = sortedIndexes.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    val bitmaps = byHigh.map { case (hi, vs) =>
      (hi.toInt, serialize32(vs.map(v => (v & 0xffffffffL).toInt)))
    }
    val size = 4 + 8 + bitmaps.map(4 + _._2.length).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic)
    bb.putLong(bitmaps.size.toLong)
    bitmaps.foreach { case (k, b) => bb.putInt(k); bb.put(b) }
    bb.array()
  }

  /** 32-bit values (sorted unsigned) → standard roaring format, no-run
    * cookie (array containers ≤ 4096 entries, bitmap containers above). */
  private def serialize32(values: Array[Int]): Array[Byte] = {
    val byKey = values.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
    val conts = byKey.map { case (k, vs) =>
      (k, vs.map(v => (v & 0xffff).toShort).sorted(Ordering.by[Short, Int](_ & 0xffff)))
    }
    val bodySizes = conts.map { case (_, vs) =>
      if (vs.length > ArrayMaxCard) 8192 else vs.length * 2
    }
    val n = conts.size
    val size = 4 + 4 + n * 4 + n * 4 + bodySizes.sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(CookieNoRun)
    bb.putInt(n)
    conts.foreach { case (k, vs) =>
      bb.putShort(k.toShort); bb.putShort((vs.length - 1).toShort)
    }
    var off = 4 + 4 + n * 4 + n * 4
    bodySizes.foreach { s => bb.putInt(off); off += s }
    conts.foreach { case (_, vs) =>
      if (vs.length > ArrayMaxCard) {
        val words = new Array[Long](1024)
        vs.foreach { v => val u = v & 0xffff; words(u >>> 6) |= 1L << (u & 63) }
        words.foreach(bb.putLong)
      } else vs.foreach(bb.putShort)
    }
    bb.array()
  }

  /** Portable bytes → sorted deleted row indexes. Accepts run containers
    * and both cookies (real engines emit either). */
  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt()
    require(magic == Magic, s"bad RoaringBitmapArray magic $magic")
    val n = bb.getLong()
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0L
    while (i < n) {
      val hi = (bb.getInt().toLong & 0xffffffffL) << 32
      deserialize32(bb, v32 => out += (hi | (v32.toLong & 0xffffffffL)))
      i += 1
    }
    out.toArray
  }

  private def deserialize32(bb: ByteBuffer, emit: Int => Unit): Unit = {
    val cookie = bb.getInt()
    val hasRun = (cookie & 0xffff) == CookieRun
    val nCont =
      if (hasRun) (cookie >>> 16) + 1
      else {
        require(cookie == CookieNoRun, s"bad roaring cookie $cookie")
        bb.getInt()
      }
    val runFlags = if (hasRun) {
      val a = new Array[Byte]((nCont + 7) / 8); bb.get(a); a
    } else null
    val keys = new Array[Int](nCont)
    val cards = new Array[Int](nCont)
    var i = 0
    while (i < nCont) {
      keys(i) = bb.getShort() & 0xffff
      cards(i) = (bb.getShort() & 0xffff) + 1
      i += 1
    }
    if (!hasRun || nCont >= NoOffsetThreshold) {
      i = 0; while (i < nCont) { bb.getInt(); i += 1 } // offsets; parse is sequential
    }
    i = 0
    while (i < nCont) {
      val base = keys(i) << 16
      val isRun = hasRun && (runFlags(i / 8) & (1 << (i % 8))) != 0
      if (isRun) {
        val nRuns = bb.getShort() & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort() & 0xffff
          val len = bb.getShort() & 0xffff
          var v = start
          while (v <= start + len) { emit(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) > ArrayMaxCard) {
        var w = 0
        while (w < 1024) {
          val word = bb.getLong()
          var b = 0
          while (b < 64) {
            if ((word & (1L << b)) != 0) emit(base | (w * 64 + b))
            b += 1
          }
          w += 1
        }
      } else {
        var c = 0
        while (c < cards(i)) { emit(base | (bb.getShort() & 0xffff)); c += 1 }
      }
      i += 1
    }
  }

  // ---- DV file framing -------------------------------------------------

  /** Write one DV file holding `dvs` (serialized bitmaps) and return each
    * vector's `offset` (pointing at its size field, per the protocol). */
  def writeFile(target: Path, dvs: Seq[Array[Byte]]): Seq[Int] = {
    val totalSize = 1 + dvs.map(8 + _.length).sum
    val bb = ByteBuffer.allocate(totalSize) // BIG endian framing
    bb.put(1.toByte) // format version
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    dvs.foreach { data =>
      offsets += bb.position()
      bb.putInt(data.length)
      bb.put(data)
      val crc = new java.util.zip.CRC32
      crc.update(data)
      bb.putInt(crc.getValue.toInt)
    }
    Files.createDirectories(target.getParent)
    Files.write(target, bb.array())
    offsets.toSeq
  }

  /** Read the DV at `offset` (size-prefixed, CRC-checked). */
  def readAt(file: Path, offset: Int, expectedSize: Int): Array[Byte] = {
    val all = Files.readAllBytes(file)
    require(all.nonEmpty && all(0) == 1.toByte,
      s"$file: unsupported DV file format version ${if (all.isEmpty) "<empty>" else all(0)}")
    val bb = ByteBuffer.wrap(all)
    bb.position(offset)
    val size = bb.getInt()
    require(size == expectedSize,
      s"$file@$offset: size field $size != descriptor sizeInBytes $expectedSize")
    val data = new Array[Byte](size)
    bb.get(data)
    val crc = new java.util.zip.CRC32
    crc.update(data)
    val stored = bb.getInt()
    require(stored == crc.getValue.toInt,
      s"$file@$offset: CRC mismatch (stored $stored, computed ${crc.getValue.toInt})")
    data
  }

  /** Table-relative DV file path for a storageType-`u` descriptor:
    * `<prefix>/deletion_vector_<canonical uuid>.bin`, uuid = the last 20
    * base85 chars, prefix = anything before them. */
  def relativePathOf(pathOrInlineDv: String): String = {
    require(pathOrInlineDv.length >= 20,
      s"storageType=u pathOrInlineDv too short: '$pathOrInlineDv'")
    val prefix = pathOrInlineDv.dropRight(20)
    val uuidBytes = base85Decode(pathOrInlineDv.takeRight(20), 16)
    val ub = ByteBuffer.wrap(uuidBytes)
    val uuid = new java.util.UUID(ub.getLong, ub.getLong)
    val name = s"deletion_vector_$uuid.bin"
    if (prefix.isEmpty) name else s"$prefix/$name"
  }

  /** Encode a UUID for a storageType-`u` descriptor. */
  def encodeUuid(uuid: java.util.UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    base85Encode(bb.array())
  }

  /** Resolve a descriptor to its serialized bitmap bytes. */
  def resolve(tableRoot: Path, d: Descriptor): Array[Byte] = d.storageType match {
    case "u" =>
      readAt(tableRoot.resolve(relativePathOf(d.pathOrInlineDv)),
        d.offset.getOrElse(1), d.sizeInBytes)
    case "i" => base85Decode(d.pathOrInlineDv, d.sizeInBytes)
    case "p" =>
      readAt(java.nio.file.Paths.get(d.pathOrInlineDv), d.offset.getOrElse(1),
        d.sizeInBytes)
    case other =>
      throw new IllegalArgumentException(s"unknown DV storageType '$other'")
  }
}
