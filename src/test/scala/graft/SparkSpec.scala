package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  val sfTiny = "/root/testdata/sf0.001"

  /** A temp directory deleted when the test JVM exits. Every suite MUST
    * use this instead of a bare Files.createTempDirectory: suites build
    * indexes/corpora into their temp dirs and a bare one outlives the
    * run — measured ~50 MB leaked per `sbt test` across four rounds of
    * runs (tens of GB of /tmp). Deletion at JVM exit (not afterAll) so
    * cross-test lazy vals (e.g. UpsertSpec's shared index dirs) stay
    * valid for the whole run.
    */
  def tempDir(tag: String): String = graft.util.Tmp.dir(tag)
}
