package graft

import graft.operators.GraftIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FrameSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("frame series management and properties") {
    val f = Frame(Seq((1, "a"), (2, "b")).toDF("id", "s"))
    assert(f.rowCount == 2 && f.contains("id", "s") && !f.contains("x"))
    assert(f.containsAny("x", "id"))
    val g = f.addSeries("id2", col("id") * 2)
      .renameSeries("s", "label")
      .duplicateSeries("id", "id_copy")
    assert(g.seriesNames == Seq("id", "label", "id2", "id_copy"))
    assert(g.delSeries("id2").seriesNames == Seq("id", "label", "id_copy"))
    val p = f.putProperty("weight-series", "w").putProperty("k", 7)
    assert(p.getProperty("weight-series").contains("w"))
    assert(p.delProperty("k").propertyNames == Seq("weight-series"))
    assert(f.shallowCopy.df eq f.df)
  }

  test("frame point access: refBy and setWhere") {
    val f = Frame(Seq((1, 10.0), (2, 20.0)).toDF("id", "v"))
    assert(f.refBy("id", 2, "v").contains(20.0))
    assert(f.refBy("id", 99, "v").isEmpty)
    val g = f.setWhere(col("id") === 1, "v", 99.0)
    assert(g.refBy("id", 1, "v").contains(99.0))
    assert(g.refBy("id", 2, "v").contains(20.0))
  }

  test("range index layout prunes and looks up") {
    val df = (1 to 1000).map(i => (i.toLong, i % 7)).toDF("id", "grp")
    val idx = GraftIndex.rangeIndexed(df, "id", partitions = 8)
    assert(idx.rdd.getNumPartitions == 8)
    // sorted within partitions
    val ok = idx.select("id").mapPartitions { it =>
      val a = it.map(_.getLong(0)).toArray
      Iterator.single(a.sameElements(a.sorted))
    }.collect()
    assert(ok.forall(identity))
    assert(GraftIndex.indexOf(idx, "grp", 3, "id").contains(3L))
    assert(GraftIndex.allIndicesOf(idx, "grp", 3, "id").count() == 143)
    assert(GraftIndex.equalRange(idx, "id", 10, 19).count() == 10)
  }
}
