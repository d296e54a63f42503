package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (small core count — test data is tiny and
  * session startup dominates otherwise).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = {
    // shared across suites; stopped by the JVM exiting
    super.afterAll()
  }
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local(cores = 4, appName = "graft-test")
}
