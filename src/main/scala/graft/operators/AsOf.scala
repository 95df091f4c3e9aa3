package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** As-of (forward) join: for each left row, the value of the first
  * right row with the same key and rts >= lts + delay.
  *
  * This is the operator behind time-delay-series
  * (/root/reference/private/scatter.rkt `time-delay-series`) done
  * properly at scale: both sides hash-co-partitioned on the key and
  * sorted within partitions, then a per-partition two-pointer merge —
  * O(n+m) per key versus the O(n·m)-per-key pair join the declarative
  * formulation produces. Memory is bounded by one key's right-side
  * rows (the same bound a window operator has).
  *
  * Decision record (guide's custom-operator ladder): built-in
  * composition exists (`Lookup.timeDelay`) but is quadratic per key; a
  * full LogicalPlan+Strategy isn't needed since the operator has a
  * fixed schema contract — the co-partitioned `zipPartitions` merge
  * below IS the physical operator, and Catalyst still plans everything
  * upstream of the exchanges.
  */
object AsOf {

  /** Output: (key, id, delayed_value) — mirrors Lookup.timeDelay. */
  def forwardJoin(events: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, idCol: String, delay: Double): DataFrame = {
    val spark = events.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    // identical hash partitioning + (key, ts, id) sort on both sides →
    // zipPartitions sees aligned, sorted key blocks
    val l = events.select(col(keyCol).cast("long"), col(tsCol).cast("double"),
        col(idCol).cast("long"))
      .repartition(n, col(keyCol)).sortWithinPartitions(keyCol, tsCol, idCol)
    val r = events.select(col(keyCol).cast("long"), col(tsCol).cast("double"),
        col(idCol).cast("long"), col(valueCol).cast("double"))
      .repartition(n, col(keyCol)).sortWithinPartitions(keyCol, tsCol, idCol)

    val out = l.rdd.zipPartitions(r.rdd) { (li, ri) =>
      val rBuf = ri.buffered
      var curKey = Long.MinValue
      var block: ArrayBuffer[(Double, Long, Double)] = null // (ts, id, value)
      var ptr = 0
      li.flatMap { lrow =>
        val k = lrow.getLong(0); val lts = lrow.getDouble(1); val lid = lrow.getLong(2)
        if (k != curKey) {
          // advance right stream to this key's block
          while (rBuf.hasNext && rBuf.head.getLong(0) < k) rBuf.next()
          block = new ArrayBuffer[(Double, Long, Double)]
          while (rBuf.hasNext && rBuf.head.getLong(0) == k) {
            val rr = rBuf.next()
            block += ((rr.getDouble(1), rr.getLong(2), rr.getDouble(3)))
          }
          curKey = k; ptr = 0
        }
        // two-pointer: lts is nondecreasing within the key, so ptr only moves forward
        while (ptr < block.length && block(ptr)._1 < lts + delay) ptr += 1
        if (ptr < block.length) Iterator.single(Row(k, lid, block(ptr)._3))
        else Iterator.empty
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField(idCol, LongType, nullable = false),
      StructField("delayed_value", DoubleType, nullable = false))))
  }
}
