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

  /** Run `body` with the given SQL confs set, restoring the previous
    * values (or unsetting) afterwards — the session is shared across
    * suites, so no conf change may escape a test.
    */
  def withSQLConf[A](pairs: (String, String)*)(body: => A): A = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  override def afterAll(): Unit = {
    // session shared across suites — do not stop
    super.afterAll()
  }
}
