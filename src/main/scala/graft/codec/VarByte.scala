package graft.codec

import java.io.ByteArrayOutputStream

/** Variable-byte (7-bit continuation) codec for non-negative ints/longs.
  *
  * The reference delegates posting compression to Lucene 5.4's
  * `Lucene50PostingsFormat` (delta + varbyte/FOR blocks), consumed opaquely
  * behind `IndexWriter` (reference `IndexTREC.java:99`). We build our own
  * explicit equivalent: docID runs are delta-encoded then varbyte-packed;
  * term-frequency and doc-length runs are varbyte-packed raw.
  *
  * Layout per value: little-endian groups of 7 bits, high bit = "more bytes
  * follow". Values must be >= 0.
  */
object VarByte {

  /** Append one non-negative long to `out`. */
  def write(out: ByteArrayOutputStream, value: Long): Unit = {
    require(value >= 0, s"varbyte requires non-negative value, got $value")
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  def write(out: ByteArrayOutputStream, value: Int): Unit = write(out, value.toLong)

  def encode(values: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(values.length * 2)
    var i = 0
    while (i < values.length) { write(out, values(i)); i += 1 }
    out.toByteArray
  }

  /** Decode exactly `n` longs starting at `blob(offset)`. */
  def decode(blob: Array[Byte], n: Int, offset: Int = 0): Array[Long] = {
    val r = new Reader(blob, offset)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = r.nextLong(); i += 1 }
    out
  }

  /** Streaming decoder; `pos` exposes the byte offset (for block seeks). */
  final class Reader(blob: Array[Byte], start: Int = 0) {
    private var p = start
    def pos: Int = p
    def seek(offset: Int): Unit = { p = offset }
    def nextLong(): Long = {
      var b = blob(p); p += 1
      var v: Long = b & 0x7fL
      var shift = 7
      while ((b & 0x80) != 0) {
        b = blob(p); p += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      }
      v
    }
    def nextInt(): Int = nextLong().toInt
  }
}
