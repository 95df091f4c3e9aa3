package graft

import graft.sources.{CsvOps, Gpx, SqlSource, Tcx}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SourcesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("CSV roundtrip preserves values and NA convention") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val df = Seq((1, Some(1.5), "x"), (2, None, "y")).toDF("id", "v", "s")
    CsvOps.write(df, s"$dir/out", na = "NA")
    val back = CsvOps.read(spark, s"$dir/out", na = "NA")
    assert(back.count() == 2)
    assert(back.schema("v").dataType.typeName == "double")
    assert(back.filter(col("v").isNull).count() == 1)
  }

  private val gpxXml =
    """<?xml version="1.0"?>
      |<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1">
      |<trk><name>t</name><trkseg>
      |<trkpt lat="45.0" lon="25.0"><ele>100.0</ele><time>2024-01-01T00:00:00Z</time></trkpt>
      |<trkpt lat="45.001" lon="25.0"><ele>101.0</ele><time>2024-01-01T00:00:10Z</time></trkpt>
      |<trkpt lat="45.002" lon="25.0"><ele>102.0</ele><time>2024-01-01T00:00:20Z</time></trkpt>
      |</trkseg></trk></gpx>""".stripMargin

  test("GPX read: trackpoints with cumulative distance; write roundtrips") {
    val dir = Files.createTempDirectory("graft_gpx")
    Files.writeString(dir.resolve("a.gpx"), gpxXml)
    val df = Gpx.read(spark, dir.toString + "/*.gpx")
    assert(df.count() == 3)
    val rows = df.orderBy("idx").collect()
    assert(rows.head.getAs[Double]("dst") == 0.0)
    // ~111m per 0.001° latitude
    val d1 = rows(1).getAs[Double]("dst")
    assert(d1 > 100 && d1 < 125)
    assert(rows(2).getAs[Double]("dst") > d1)
    val out = dir.resolve("out.gpx").toString
    Gpx.write(df.select(col("lat"), col("lon"), col("ele"), col("timestamp")), out)
    val back = Gpx.read(spark, out)
    assert(back.count() == 3)
    assert(back.agg(max("ele")).first().getDouble(0) == 102.0)
  }

  private val tcxXml =
    """<?xml version="1.0"?>
      |<TrainingCenterDatabase xmlns="http://www.garmin.com/xmlschemas/TrainingCenterDatabase/v2">
      |<Activities><Activity Sport="Biking"><Id>2024-01-01T00:00:00Z</Id>
      |<Lap StartTime="2024-01-01T00:00:00Z"><Track>
      |<Trackpoint><Time>2024-01-01T00:00:00Z</Time>
      | <Position><LatitudeDegrees>45.0</LatitudeDegrees><LongitudeDegrees>25.0</LongitudeDegrees></Position>
      | <AltitudeMeters>100.0</AltitudeMeters><DistanceMeters>0.0</DistanceMeters>
      | <HeartRateBpm><Value>120</Value></HeartRateBpm><Cadence>80</Cadence></Trackpoint>
      |<Trackpoint><Time>2024-01-01T00:00:10Z</Time>
      | <Position><LatitudeDegrees>45.001</LatitudeDegrees><LongitudeDegrees>25.0</LongitudeDegrees></Position>
      | <AltitudeMeters>101.0</AltitudeMeters><DistanceMeters>111.0</DistanceMeters>
      | <HeartRateBpm><Value>125</Value></HeartRateBpm><Cadence>82</Cadence></Trackpoint>
      |</Track></Lap></Activity></Activities></TrainingCenterDatabase>""".stripMargin

  test("TCX read: laps, hr, cadence") {
    val dir = Files.createTempDirectory("graft_tcx")
    Files.writeString(dir.resolve("a.tcx"), tcxXml)
    val df = Tcx.read(spark, dir.toString + "/*.tcx")
    assert(df.count() == 2)
    val r = df.orderBy("idx").collect()
    assert(r.head.getAs[Double]("hr") == 120.0)
    assert(r(1).getAs[Double]("cad") == 82.0)
    assert(r.forall(_.getAs[Int]("lap") == 0))
  }

  test("df-read/sql via in-memory Derby") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE t (id INT, name VARCHAR(20), v DOUBLE)")
    st.execute("INSERT INTO t VALUES (1, 'a', 1.5), (2, 'b', 2.5)")
    st.close()
    val df = SqlSource.read(spark, url, "SELECT id, name, v FROM t")
    assert(df.count() == 2)
    assert(df.agg(sum("v")).first().getDouble(0) == 4.0)
    conn.close()
  }
}
