package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import java.time.Instant

/** GPX source/sink — mirrors /root/reference/private/gpx.rkt
  * (df-write/gpx l.221, parse-track-point l.264, df-read/gpx l.499).
  *
  * Read is distributed: one task per file (wholeTextFiles), DOM parse
  * per file, rows carry the source path so many activities load into
  * one frame keyed by file. At 100 TB of tracks the same shape holds —
  * files partition across executors; no driver parsing.
  *
  * Series read per trackpoint (parse-track-point, gpx.rkt l.264-305):
  * lat/lon/ele/timestamp plus the extension series hr, cad, spd, pwr,
  * temp under their gpxtpx:/gpxdata:/bare tag spellings, and dst — the
  * file's gpxdata:distance when any point provides it, else the
  * cumulative haversine distance the reference synthesizes
  * (gpx.rkt l.443-455). Write emits the reference's default series
  * list "timestamp hr cad spd pwr dst" (gpx.rkt l.223) as gpxdata:
  * extension tags, preserves multiple <trkseg> blocks via the `seg`
  * column, and writes laps as named waypoints (gpx-emit-wpt l.113). */
object Gpx {

  case class TrackPoint(file: String, seg: Int, idx: Int, lat: Double, lon: Double,
                        ele: Option[Double], timestamp: Option[Long], hr: Option[Double],
                        cad: Option[Double], spd: Option[Double], pwr: Option[Double],
                        temp: Option[Double], dst: Option[Double])

  private def haversine(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val r = 6371008.8
    val dLat = math.toRadians(lat2 - lat1); val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * math.pow(math.sin(dLon / 2), 2)
    2 * r * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** First element under `pt` matching any of the (namespace-agnostic)
    * labels — covers the gpxtpx:, gpxdata:, and bare spellings the
    * reference accepts, including tags nested in TrackPointExtension. */
  private def ext(pt: scala.xml.Node, labels: String*): Option[Double] =
    labels.view.flatMap(l => (pt \\ l).headOption).headOption
      .flatMap(n => n.text.trim.toDoubleOption)

  private case class RawPoint(seg: Int, lat: Double, lon: Double, ele: Option[Double],
                              time: Option[Long], hr: Option[Double], cad: Option[Double],
                              spd: Option[Double], pwr: Option[Double], temp: Option[Double],
                              fileDst: Option[Double])

  private[sources] def parse(file: String, content: String): Seq[TrackPoint] = {
    val root = scala.xml.XML.loadString(content)
    val raw = for ((seg, segIdx) <- (root \\ "trkseg").zipWithIndex.toSeq;
                   pt <- seg \ "trkpt") yield {
      RawPoint(segIdx,
        (pt \@ "lat").toDouble, (pt \@ "lon").toDouble,
        (pt \ "ele").headOption.flatMap(_.text.trim.toDoubleOption),
        (pt \ "time").headOption.map(t => Instant.parse(t.text.trim).toEpochMilli),
        hr = ext(pt, "hr", "heartrate"),
        cad = ext(pt, "cad", "cadence"),
        spd = ext(pt, "speed"),
        pwr = ext(pt, "power", "PowerInWatts"),
        temp = ext(pt, "atemp", "temp"),
        fileDst = ext(pt, "distance"))
    }
    // dst: the file's own distance series when present, else cumulative
    // haversine over the whole track (reference creates the series only
    // when absent — gpx.rkt l.443)
    val anyFileDst = raw.exists(_.fileDst.isDefined)
    var prev: Option[(Double, Double)] = None
    var cum = 0.0
    raw.zipWithIndex.map { case (p, idx) =>
      val dst = if (anyFileDst) p.fileDst else {
        prev.foreach { case (pla, plo) => cum += haversine(pla, plo, p.lat, p.lon) }
        prev = Some((p.lat, p.lon))
        Some(cum)
      }
      TrackPoint(file, p.seg, idx, p.lat, p.lon, p.ele, p.time,
        p.hr, p.cad, p.spd, p.pwr, p.temp, dst)
    }
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

  /** df-write/gpx: rows (lat, lon[, ele, timestamp, hr, cad, spd, pwr,
    * dst, seg]) → one GPX file. Extension series follow the reference's
    * default export list (gpx.rkt l.223) as gpxdata: tags
    * (gpx-emit-trkpt l.96-108); a `seg` column splits the track into
    * multiple <trkseg> blocks (rows must arrive seg-ordered); `laps`
    * and `waypoints` emit as named waypoints ahead of the track.
    * Result sets written as GPX are small (a track); the XML renders on
    * the driver via toLocalIterator to bound memory. */
  def write(df: DataFrame, path: String, name: String = "graft export",
            laps: Seq[(Double, Double, Long)] = Nil,
            waypoints: Seq[(Double, Double, Option[Double], Long, String)] = Nil): Unit = {
    val cols = df.columns.toSet
    def opt(c: String) = (if (cols(c)) col(c) else lit(null)).cast("double").as(c)
    val sel = df.select(
      col("lat"), col("lon"), opt("ele"),
      (if (cols("timestamp")) col("timestamp").cast("timestamp") else lit(null).cast("timestamp")).as("timestamp"),
      opt("hr"), opt("cad"), opt("spd"), opt("pwr"), opt("dst"),
      (if (cols("seg")) coalesce(col("seg"), lit(0)) else lit(0)).cast("int").as("seg"))
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= "<gpx version=\"1.1\" creator=\"graft\" xmlns=\"http://www.topografix.com/GPX/1/1\"\n"
    sb ++= "     xmlns:gpxdata=\"http://www.cluetrust.com/XML/GPXDATA/1/0\">\n"
    // reference emits lap markers as named waypoints ahead of the track
    laps.zipWithIndex.foreach { case ((lat, lon, epochMs), i) =>
      sb ++= s"""<wpt lat="$lat" lon="$lon"><time>${Instant.ofEpochMilli(epochMs)}</time>""" +
        s"<name>Lap ${i + 1}</name></wpt>\n"
    }
    waypoints.foreach { case (lat, lon, ele, epochMs, wname) =>
      sb ++= s"""<wpt lat="$lat" lon="$lon">"""
      ele.foreach(e => sb ++= s"<ele>$e</ele>")
      sb ++= s"<time>${Instant.ofEpochMilli(epochMs)}</time>" +
        s"<name>${scala.xml.Utility.escape(wname)}</name></wpt>\n"
    }
    sb ++= s"<trk><name>${scala.xml.Utility.escape(name)}</name>\n"
    var curSeg = Option.empty[Int]
    sel.toLocalIterator().forEachRemaining { r =>
      val seg = r.getInt(9)
      if (!curSeg.contains(seg)) {
        if (curSeg.isDefined) sb ++= "</trkseg>\n"
        sb ++= "<trkseg>\n"
        curSeg = Some(seg)
      }
      sb ++= s"""<trkpt lat="${r.getDouble(0)}" lon="${r.getDouble(1)}">"""
      if (!r.isNullAt(2)) sb ++= s"<ele>${r.getDouble(2)}</ele>"
      if (!r.isNullAt(3)) sb ++= s"<time>${r.getTimestamp(3).toInstant}</time>"
      val hasExt = (4 to 8).exists(i => !r.isNullAt(i))
      if (hasExt) {
        sb ++= "<extensions>"
        if (!r.isNullAt(4)) sb ++= s"<gpxdata:hr>${r.getDouble(4)}</gpxdata:hr>"
        if (!r.isNullAt(5)) sb ++= s"<gpxdata:cadence>${r.getDouble(5)}</gpxdata:cadence>"
        if (!r.isNullAt(6)) sb ++= s"<gpxdata:speed>${r.getDouble(6)}</gpxdata:speed>"
        if (!r.isNullAt(7)) sb ++= s"<gpxdata:power>${r.getDouble(7)}</gpxdata:power>"
        if (!r.isNullAt(8)) sb ++= s"<gpxdata:distance>${r.getDouble(8)}</gpxdata:distance>"
        sb ++= "</extensions>"
      }
      sb ++= "</trkpt>\n"
    }
    if (curSeg.isDefined) sb ++= "</trkseg>\n"
    sb ++= "</trk></gpx>\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.result())
  }
}
