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

  test("contracts: violations counted, NA rows exempt; hasNonNa") {
    val f = Frame(Seq((1, Some(5.0)), (2, Some(-3.0)), (3, None)).toDF("id", "v"))
      .setContract("v", col("v") >= 0)
    assert(f.checkContracts() == Map("v" -> 1L)) // only the -3 row; NA exempt
    assert(f.setWhere(col("id") === 2, "v", 7.0).checkContracts() == Map("v" -> 0L))
    assert(f.addIndex("i", "id").propertyNames.isEmpty) // registries don't leak into properties
    // registries follow series lifecycle: delete drops, rename re-keys
    assert(f.delSeries("v").checkContracts().isEmpty)
    assert(f.renameSeries("v", "w").checkContracts() == Map("w" -> 1L))
    val fi = f.addIndex("i", "v")
    assert(fi.delSeries("v").indexNames.isEmpty)
    assert(fi.renameSeries("v", "w").indexSeries("i").contains("w"))
    assert(f.hasNonNa("v"))
    assert(!Frame(Seq(Option.empty[Double]).toDF("v")).hasNonNa("v"))
  }

  test("named index registry: add/del/series/layout") {
    val f = Frame((1 to 100).map(i => (i.toLong, i % 5)).toDF("id", "grp"))
      .addIndex("by_id", "id")
    assert(f.indexNames == Seq("by_id"))
    assert(f.indexSeries("by_id").contains("id"))
    val layout = f.indexed("by_id").get
    assert(layout.count() == 100)
    assert(f.delIndex("by_id").indexNames.isEmpty)
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

  test("batched index-of*: lower-bound per probe, null past the end") {
    // series 10,20,...,100 ordered by rid
    val df = (1 to 10).map(i => (i.toLong, i * 10)).toDF("rid", "v")
    val r = GraftIndex.indexOfAll(df, "v", Seq(10, 35, 100, 999), "rid")
      .collect().map(x => x.getInt(0) -> (if (x.isNullAt(1)) null else x.getLong(1))).toMap
    assert(r(10) == 1L)   // exact hit → its own position
    assert(r(35) == 4L)   // insertion point: first v >= 35 is 40 at rid 4
    assert(r(100) == 10L)
    assert(r(999) == null) // past the end → NA (reference insertion-point = row count)
    val exact = GraftIndex.indexOfAll(df, "v", Seq(10, 35), "rid", exact = true)
      .collect().map(x => x.getInt(0) -> (if (x.isNullAt(1)) null else x.getLong(1))).toMap
    assert(exact(10) == 1L && exact(35) == null)
  }

  test("batched lookup*: value columns at the lower-bound row") {
    val df = Seq((1L, 10, "a", 1.5), (2L, 20, "b", 2.5), (3L, 30, "c", 3.5))
      .toDF("rid", "v", "s", "x")
    val r = GraftIndex.lookupAll(df, "v", Seq("s", "x"), Seq(15, 30, 99), "rid")
      .collect().map(x => x.getInt(0) ->
        (if (x.isNullAt(1)) null else (x.getString(1), x.getDouble(2)))).toMap
    assert(r(15) == ("b", 2.5)) // first v >= 15
    assert(r(30) == ("c", 3.5))
    assert(r(99) == null)
  }
}
