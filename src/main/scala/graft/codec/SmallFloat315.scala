package graft.codec

/** Lossy float-to-byte packing with 3 mantissa bits, 5 exponent bits and
  * zero-exponent offset 15 — the published `SmallFloat.floatToByte315`
  * scheme Lucene uses for 1-byte norms. The reference's `BM25e`/`TMPLe`
  * similarities score through this lossy doc length
  * (reference `BM25e.java:22-27,151-165`, rationale `NOTES.txt:182-245`);
  * the plain `BM25`/`TMPL` variants use exact lengths. Our engine stores
  * exact `Int` doc lengths and applies this codec only when the byte-encoded
  * scoring variants are requested.
  */
object SmallFloat315 {

  def floatToByte315(f: Float): Byte = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val smallfloat = bits >> (24 - 3)
    if (smallfloat <= ((63 - 15) << 3)) {
      if (bits <= 0) 0 else 1
    } else if (smallfloat >= ((63 - 15) << 3) + 0x100) {
      -1
    } else {
      (smallfloat - ((63 - 15) << 3)).toByte
    }
  }

  def byte315ToFloat(b: Byte): Float = {
    if (b == 0) 0.0f
    else {
      var bits = (b & 0xff) << (24 - 3)
      bits += (63 - 15) << 24
      java.lang.Float.intBitsToFloat(bits)
    }
  }

  /** 256-entry decode table, mirroring the `NORM` cache in the reference's
    * byte-encoded similarities (`BM25e.java:22-27`).
    */
  val NORM: Array[Float] = Array.tabulate(256)(i => byte315ToFloat(i.toByte))
}
