package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded top-k argmax as a typed `Aggregator` UDAF: keeps the first
  * k (id, score) pairs under the total order (score DESC, id ASC) and
  * emits the ids in rank order — exactly the rows
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id ASC)
  * <= k` selects, but as a PARTIAL-AGGREGATABLE reduction.
  *
  * Why it exists (round 14): q95's exact-recall side scores every
  * probe against the whole corpus — probes·n pair rows. As a window,
  * that materializes the entire pair frame through one
  * partition-by-probe sort: measured at sf90 (1.8M vectors × 2000
  * probes = 3.6G rows) the sort spilled 114 GB memory + 44 GB disk
  * and took 943 s wall. As this aggregator, the map side collapses
  * each partition to ≤ k rows per probe before the exchange
  * (ObjectHashAggregate partial), so the shuffle carries
  * partitions·probes·k rows — ~320k instead of 3.6G.
  *
  * Determinism: (score DESC, id ASC) is a TOTAL order over distinct
  * ids, so insertion order / partial-merge order cannot change the
  * result — the output is a set property, same contract as
  * [[KmvDistinct]]. Scores must be non-NaN (q95's cosines are rounded
  * finite doubles by the vecs admission); duplicate ids within one
  * group are not collapsed (q95's pair frame cannot produce them).
  *
  * The output encoder is injected (`spark.implicits` owns the
  * primitive-array encoders); the buffer rides kryo like
  * [[KmvDistinct]] — it only serializes at the exchange, and the
  * result is encoding-independent. */
class TopKByScore(k: Int, out: Encoder[Array[Long]])
    extends Aggregator[(Long, Double), Array[(Long, Double)], Array[Long]] {

  private def ranksBefore(aId: Long, aS: Double, bId: Long, bS: Double) =
    aS > bS || (aS == bS && aId < bId)

  override def zero: Array[(Long, Double)] = Array.empty

  private def insert(buf: Array[(Long, Double)], id: Long,
      s: Double): Array[(Long, Double)] = {
    if (buf.length == k &&
        !ranksBefore(id, s, buf(k - 1)._1, buf(k - 1)._2)) buf
    else {
      var i = 0
      while (i < buf.length && ranksBefore(buf(i)._1, buf(i)._2, id, s))
        i += 1
      val n = math.min(buf.length + 1, k)
      val outA = new Array[(Long, Double)](n)
      System.arraycopy(buf, 0, outA, 0, i)
      outA(i) = (id, s)
      if (n - i - 1 > 0) System.arraycopy(buf, i, outA, i + 1, n - i - 1)
      outA
    }
  }

  override def reduce(buf: Array[(Long, Double)],
      in: (Long, Double)): Array[(Long, Double)] = insert(buf, in._1, in._2)

  override def merge(a: Array[(Long, Double)],
      b: Array[(Long, Double)]): Array[(Long, Double)] =
    b.foldLeft(a)((acc, x) => insert(acc, x._1, x._2))

  override def finish(buf: Array[(Long, Double)]): Array[Long] =
    buf.map(_._1)

  override def bufferEncoder: Encoder[Array[(Long, Double)]] =
    Encoders.kryo[Array[(Long, Double)]]
  override def outputEncoder: Encoder[Array[Long]] = out
}
