package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** K-minimum-values distinct-count sketch as a typed `Aggregator`
  * UDAF — the mergeable-sketch shape (HLL/KMV/theta) a large-scale
  * pipeline uses for cheap cardinality. KMV over the engine's
  * portable 32-bit hash is fully DETERMINISTIC (the k smallest
  * distinct hash values are a set property, independent of partial
  * aggregation order), so unlike HLL it hash-matches a SQL oracle
  * exactly: estimate = (k-1)·2³² / h_k when ≥ k distinct hashes are
  * seen, else the exact count.
  *
  * The buffer is a sorted Array[Long] of ≤ k distinct hashes —
  * O(k) merge, tiny fixed-size state, partial+final aggregation
  * friendly.
  */
class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], Double] {

  override def zero: Array[Long] = Array.emptyLongArray

  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf // h larger than current k minima
    }
  }

  override def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble * 4294967296.0 / buf(k - 1).toDouble

  // kryo, not javaSerialization: the buffer round-trips on every
  // partial merge, and kryo writes a primitive long[] as length +
  // packed values instead of a full Java object-stream header per
  // merge. (KMV is order-independent, so encoding never affects the
  // result — only merge overhead.)
  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
