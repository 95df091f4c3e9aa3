package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import java.time.Instant

/** GPX source/sink — mirrors /root/reference/private/gpx.rkt
  * (df-write/gpx l.221, parse-track-point l.264, df-read/gpx l.499: lat/lon/alt/timestamp/distance series + waypoints +
  * laps; `df-write/gpx`).
  *
  * Read is distributed: one task per file (wholeTextFiles), DOM parse
  * per file, rows carry the source path so many activities load into
  * one frame keyed by file. At 100 TB of tracks the same shape holds —
  * files partition across executors; no driver parsing.
  */
object Gpx {

  case class TrackPoint(file: String, seg: Int, idx: Int, lat: Double, lon: Double,
                        ele: Option[Double], timestamp: Option[Long], hr: Option[Double],
                        dst: Double)

  private def haversine(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val r = 6371008.8
    val dLat = math.toRadians(lat2 - lat1); val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * math.pow(math.sin(dLon / 2), 2)
    2 * r * math.asin(math.min(1.0, math.sqrt(a)))
  }

  private[sources] def parse(file: String, content: String): Seq[TrackPoint] = {
    val root = scala.xml.XML.loadString(content)
    var out = List.newBuilder[TrackPoint]
    var idx = 0
    var prev: Option[(Double, Double)] = None
    var dst = 0.0
    for ((seg, segIdx) <- (root \\ "trkseg").zipWithIndex;
         pt <- seg \ "trkpt") {
      val lat = (pt \@ "lat").toDouble
      val lon = (pt \@ "lon").toDouble
      val ele = (pt \ "ele").headOption.map(_.text.trim.toDouble)
      val time = (pt \ "time").headOption.map(t => Instant.parse(t.text.trim).toEpochMilli)
      val hr = (pt \\ "hr").headOption.map(_.text.trim.toDouble)
      prev.foreach { case (pla, plo) => dst += haversine(pla, plo, lat, lon) }
      prev = Some((lat, lon))
      out += TrackPoint(file, segIdx, idx, lat, lon, ele, time, hr, dst)
      idx += 1
    }
    out.result()
  }

  /** df-read/gpx: one row per trackpoint, cumulative `dst` like the
    * reference's "dst" series. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.sparkContext.wholeTextFiles(path)
    spark.createDataset(files.flatMap { case (f, c) => parse(f, c) })(Encoders.product[TrackPoint])
      .withColumn("timestamp", (col("timestamp") / 1000).cast("timestamp"))
      .toDF()
  }

  case class WayPoint(file: String, lat: Double, lon: Double,
                      ele: Option[Double], timestamp: Option[Long], name: Option[String])

  private[sources] def parseWaypoints(file: String, content: String): Seq[WayPoint] = {
    val root = scala.xml.XML.loadString(content)
    (root \ "wpt").map { w =>
      WayPoint(file, (w \@ "lat").toDouble, (w \@ "lon").toDouble,
        (w \ "ele").headOption.map(_.text.trim.toDouble),
        (w \ "time").headOption.map(t => Instant.parse(t.text.trim).toEpochMilli),
        (w \ "name").headOption.map(_.text.trim))
    }
  }

  /** Waypoints (the reference stores them in the 'waypoints property;
    * lap markers round-trip as named waypoints). */
  def readWaypoints(spark: SparkSession, path: String): DataFrame = {
    val files = spark.sparkContext.wholeTextFiles(path)
    spark.createDataset(files.flatMap { case (f, c) => parseWaypoints(f, c) })(Encoders.product[WayPoint])
      .withColumn("timestamp", (col("timestamp") / 1000).cast("timestamp"))
      .toDF()
  }

  /** df-write/gpx: rows (lat, lon, ele?, timestamp?) → one GPX file.
    * Result sets written as GPX are small (a track); the XML renders on
    * the driver via toLocalIterator to bound memory. */
  def write(df: DataFrame, path: String, name: String = "graft export",
            laps: Seq[(Double, Double, Long)] = Nil): Unit = {
    val cols = df.columns.toSet
    val sel = df.select(
      col("lat"), col("lon"),
      (if (cols("ele")) col("ele") else lit(null)).cast("double").as("ele"),
      (if (cols("timestamp")) col("timestamp").cast("timestamp") else lit(null).cast("timestamp")).as("timestamp"))
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= "<gpx version=\"1.1\" creator=\"graft\" xmlns=\"http://www.topografix.com/GPX/1/1\">\n"
    // reference emits lap markers as named waypoints ahead of the track
    laps.zipWithIndex.foreach { case ((lat, lon, epochMs), i) =>
      sb ++= s"""<wpt lat="$lat" lon="$lon"><time>${Instant.ofEpochMilli(epochMs)}</time>""" +
        s"<name>Lap ${i + 1}</name></wpt>\n"
    }
    sb ++= s"<trk><name>${scala.xml.Utility.escape(name)}</name><trkseg>\n"
    sel.toLocalIterator().forEachRemaining { r =>
      sb ++= s"""<trkpt lat="${r.getDouble(0)}" lon="${r.getDouble(1)}">"""
      if (!r.isNullAt(2)) sb ++= s"<ele>${r.getDouble(2)}</ele>"
      if (!r.isNullAt(3)) sb ++= s"<time>${r.getTimestamp(3).toInstant}</time>"
      sb ++= "</trkpt>\n"
    }
    sb ++= "</trkseg></trk></gpx>\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.result())
  }
}
