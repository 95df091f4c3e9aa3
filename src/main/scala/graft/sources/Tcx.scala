package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import java.time.Instant

/** TCX source — mirrors /root/reference/private/tcx.rkt
  * (df-read/tcx l.269, df-read/tcx/multiple l.277: per-activity lap + trackpoint series: time,
  * lat/lon, altitude, distance, hr, cadence, watts, speed).
  * Distributed like Gpx.read: one parse task per file.
  */
object Tcx {

  case class TcxPoint(file: String, activity: Int, lap: Int, idx: Int,
                      timestamp: Option[Long], lat: Option[Double], lon: Option[Double],
                      alt: Option[Double], dst: Option[Double], hr: Option[Double],
                      cad: Option[Double], watts: Option[Double], spd: Option[Double])

  private[sources] def parse(file: String, content: String): Seq[TcxPoint] = {
    val root = scala.xml.XML.loadString(content)
    val out = List.newBuilder[TcxPoint]
    for ((act, ai) <- (root \\ "Activity").zipWithIndex) {
      var idx = 0
      for ((lap, li) <- (act \ "Lap").zipWithIndex;
           tp <- lap \\ "Trackpoint") {
        def d(n: scala.xml.NodeSeq) = n.headOption.map(_.text.trim.toDouble)
        val pos = tp \ "Position"
        out += TcxPoint(file, ai, li, idx,
          (tp \ "Time").headOption.map(t => Instant.parse(t.text.trim).toEpochMilli),
          d(pos \ "LatitudeDegrees"), d(pos \ "LongitudeDegrees"),
          d(tp \ "AltitudeMeters"), d(tp \ "DistanceMeters"),
          d(tp \ "HeartRateBpm" \ "Value"), d(tp \ "Cadence"),
          // TPX extension tags vary by vendor namespace (Watts,
          // ns3:Speed, …) — scala-xml labels drop the prefix, so a
          // label-prefix match mirrors the reference's "(^|:)Watts" /
          // "(^|:)Speed" regexes (tcx.rkt l.73-76)
          (tp \\ "_").collectFirst { case e if e.label.startsWith("Watts") => e }
            .flatMap(_.text.trim.toDoubleOption),
          (tp \\ "_").collectFirst { case e if e.label.startsWith("Speed") => e }
            .flatMap(_.text.trim.toDoubleOption))
        idx += 1
      }
    }
    out.result()
  }

  /** df-read/tcx: one row per trackpoint with lap/activity keys. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.sparkContext.wholeTextFiles(path)
    spark.createDataset(files.flatMap { case (f, c) => parse(f, c) })(Encoders.product[TcxPoint])
      .withColumn("timestamp", (col("timestamp") / 1000).cast("timestamp"))
      .toDF()
  }
}
