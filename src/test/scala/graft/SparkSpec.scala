package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs. One JVM-wide session
  * (getOrCreate) keeps the suite fast; tests must not mutate global
  * session state.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)

  val Sf0001 = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // session shared across suites — do not stop
    super.afterAll()
  }
}
