package graft.rollup

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Gorilla-style time-series chunk compression (Pelkonen et al., VLDB'15):
  * delta-of-delta timestamps + XOR'd doubles with leading/trailing-zero
  * windows. One chunk per (series, tier bucket); the typed Aggregator
  * buffers points and encodes at finish (Gorilla streams cannot be merged
  * mid-encode, so partial buffers concatenate and the final sort+encode
  * happens once per group).
  */
object Gorilla {

  // ------------------------------------------------------------ bit io

  final class BitWriter {
    private var buf = new Array[Byte](64)
    private var bitPos = 0
    private def ensure(bits: Int): Unit = {
      val need = (bitPos + bits + 7) / 8
      if (need > buf.length) {
        val n = new Array[Byte](math.max(buf.length * 2, need))
        System.arraycopy(buf, 0, n, 0, buf.length)
        buf = n
      }
    }
    def writeBit(b: Boolean): Unit = {
      ensure(1)
      if (b) buf(bitPos >> 3) = (buf(bitPos >> 3) | (0x80 >>> (bitPos & 7))).toByte
      bitPos += 1
    }
    /** write the low `n` bits of v, most-significant first */
    def writeBits(v: Long, n: Int): Unit = {
      ensure(n)
      var i = n - 1
      while (i >= 0) {
        writeBitFast(((v >>> i) & 1L) == 1L)
        i -= 1
      }
    }
    private def writeBitFast(b: Boolean): Unit = {
      if (b) buf(bitPos >> 3) = (buf(bitPos >> 3) | (0x80 >>> (bitPos & 7))).toByte
      bitPos += 1
    }
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitPos + 7) / 8)
    def lengthBits: Int = bitPos
  }

  final class BitReader(bytes: Array[Byte]) {
    private var bitPos = 0
    def readBit(): Boolean = {
      val b = (bytes(bitPos >> 3) & (0x80 >>> (bitPos & 7))) != 0
      bitPos += 1
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        v = (v << 1) | (if (readBit()) 1L else 0L)
        i += 1
      }
      v
    }
  }

  // ------------------------------------------------------------- codec

  /** encode (rank, value) points, already sorted by rank ascending. */
  def encode(points: Array[(Long, Double)]): Array[Byte] = {
    val w = new BitWriter
    w.writeBits(points.length.toLong, 32)
    if (points.isEmpty) return w.toBytes
    // first point: raw
    w.writeBits(points(0)._1, 64)
    w.writeBits(java.lang.Double.doubleToLongBits(points(0)._2), 64)
    var prevTs = points(0)._1
    var prevDelta = 0L
    var prevBits = java.lang.Double.doubleToLongBits(points(0)._2)
    var prevLead = -1
    var prevTrail = -1
    var i = 1
    while (i < points.length) {
      // delta-of-delta timestamp
      val delta = points(i)._1 - prevTs
      val dod = delta - prevDelta
      if (dod == 0L) w.writeBit(false)
      else if (dod >= -63 && dod <= 64) { w.writeBits(0x2, 2); w.writeBits(dod + 63, 7) }
      else if (dod >= -255 && dod <= 256) { w.writeBits(0x6, 3); w.writeBits(dod + 255, 9) }
      else if (dod >= -2047 && dod <= 2048) { w.writeBits(0xe, 4); w.writeBits(dod + 2047, 12) }
      else { w.writeBits(0xf, 4); w.writeBits(dod & 0xffffffffL, 32) }
      prevTs = points(i)._1
      prevDelta = delta
      // XOR value
      val bits = java.lang.Double.doubleToLongBits(points(i)._2)
      val xor = bits ^ prevBits
      if (xor == 0L) w.writeBit(false)
      else {
        w.writeBit(true)
        val lead = math.min(java.lang.Long.numberOfLeadingZeros(xor), 31)
        val trail = java.lang.Long.numberOfTrailingZeros(xor)
        if (prevLead >= 0 && lead >= prevLead && trail >= prevTrail) {
          w.writeBit(false)
          w.writeBits(xor >>> prevTrail, 64 - prevLead - prevTrail)
        } else {
          w.writeBit(true)
          val sig = 64 - lead - trail
          w.writeBits(lead.toLong, 5)
          w.writeBits(sig.toLong, 6) // 1..64; 64 encodes as 0
          w.writeBits(xor >>> trail, sig)
          prevLead = lead
          prevTrail = trail
        }
      }
      prevBits = bits
      i += 1
    }
    w.toBytes
  }

  def decode(bytes: Array[Byte]): Array[(Long, Double)] = {
    val r = new BitReader(bytes)
    val n = r.readBits(32).toInt
    val out = new Array[(Long, Double)](n)
    if (n == 0) return out
    var ts = r.readBits(64)
    var bits = r.readBits(64)
    out(0) = (ts, java.lang.Double.longBitsToDouble(bits))
    var delta = 0L
    var lead = 0
    var trail = 0
    var i = 1
    while (i < n) {
      // timestamp
      if (!r.readBit()) { /* dod = 0 */ }
      else if (!r.readBit()) delta += r.readBits(7) - 63
      else if (!r.readBit()) delta += r.readBits(9) - 255
      else if (!r.readBit()) delta += r.readBits(12) - 2047
      else delta += (r.readBits(32) << 32) >> 32 // sign-extend
      ts += delta
      // value
      if (r.readBit()) {
        if (r.readBit()) {
          lead = r.readBits(5).toInt
          var sig = r.readBits(6).toInt
          if (sig == 0) sig = 64
          trail = 64 - lead - sig
        }
        val sig = 64 - lead - trail
        bits ^= r.readBits(sig) << trail
      }
      out(i) = (ts, java.lang.Double.longBitsToDouble(bits))
      i += 1
    }
    out
  }

  // -------------------------------------------------------- aggregator

  /** groupBy(series, chunkBucket).agg(gorillaAgg) -> compressed chunk.
    * Input rows (rank, value); buffer accumulates (unsorted — shuffle
    * order is nondeterministic), finish sorts then encodes.
    */
  class ChunkAggregator extends Aggregator[(Long, Double), List[(Long, Double)], Array[Byte]] {
    def zero: List[(Long, Double)] = Nil
    def reduce(b: List[(Long, Double)], a: (Long, Double)): List[(Long, Double)] = a :: b
    def merge(b1: List[(Long, Double)], b2: List[(Long, Double)]): List[(Long, Double)] =
      b1 ::: b2
    def finish(b: List[(Long, Double)]): Array[Byte] = encode(b.sortBy(_._1).toArray)
    def bufferEncoder: Encoder[List[(Long, Double)]] = Encoders.kryo[List[(Long, Double)]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
}
