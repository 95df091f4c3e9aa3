package graft

import graft.sources.Gpx
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class GpxWaypointSpec extends AnyFunSuite with SharedSpark {

  test("GPX waypoints and lap markers roundtrip") {
    val dir = Files.createTempDirectory("graft_wpt")
    val xml =
      """<?xml version="1.0"?>
        |<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1">
        |<wpt lat="45.5" lon="25.5"><ele>120.0</ele><time>2024-01-01T00:00:05Z</time><name>Summit</name></wpt>
        |<trk><trkseg>
        |<trkpt lat="45.0" lon="25.0"><time>2024-01-01T00:00:00Z</time></trkpt>
        |<trkpt lat="45.001" lon="25.0"><time>2024-01-01T00:00:10Z</time></trkpt>
        |</trkseg></trk></gpx>""".stripMargin
    Files.writeString(dir.resolve("a.gpx"), xml)
    val wpts = Gpx.readWaypoints(spark, dir.toString + "/a.gpx")
    val w = wpts.collect()
    assert(w.length == 1)
    assert(w.head.getAs[String]("name") == "Summit")
    assert(w.head.getAs[Double]("ele") == 120.0)

    // write with lap markers → read back as waypoints
    val track = Gpx.read(spark, dir.toString + "/a.gpx")
    val out = dir.resolve("out.gpx").toString
    Gpx.write(track.select(col("lat"), col("lon"), col("ele"), col("timestamp")), out,
      laps = Seq((45.0005, 25.0, 1704067205000L)))
    val lapWpts = Gpx.readWaypoints(spark, out).collect()
    assert(lapWpts.length == 1 && lapWpts.head.getAs[String]("name") == "Lap 1")
    assert(Gpx.read(spark, out).count() == 2)
  }
}
