package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** One shared local session across suites (Spark re-uses the active
  * session via getOrCreate). */
trait SharedSpark extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = GraftSession.builder("graft-test", cpus = 4).getOrCreate()
  lazy val sf: String = "/root/testdata/sf0.001"
  override def afterAll(): Unit = { /* keep session for sibling suites */ }
}
