package graft.sources

import graft.SparkSpec
import graft.config.{SideSpec, SourceSpec}
import graft.diff.{CompareOptions, Comparator, SchemaCheck}
import java.sql.DriverManager
import org.apache.spark.sql.types._

/** Dialect/type-mapping divergence through the schema gate — the O3
  * "second engine" e2e, within sandbox limits. No second embedded SQL
  * engine exists on this classpath (only Derby ships with Spark; the
  * offline resolver carries scalatest/scalacheck only), so divergence
  * is exercised the way it actually reaches the comparator: two JDBC
  * databases whose DDL maps to DIFFERENT Spark types for the same
  * logical data (DECIMAL precision widening, CHAR blank-padding), and
  * a JDBC-vs-parquet cross-source compare where the physical integer
  * widths differ. The reference hits these exact divergences between
  * PostgreSQL and Oracle (NUMBER widening, CHAR semantics —
  * /root/reference/scribedb/oracle.py:170-188's quoting dance exists
  * because of them) and would fail only at hash time; here the
  * positional gate reports them up front, and the knobs that make an
  * intentional cross-width compare pass are explicit.
  */
class DialectDivergenceSpec extends SparkSpec {

  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def url(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def jdbcSide(db: String, qry: String): SideSpec =
    SideSpec(db, SourceSpec.Jdbc(url(db), Some(Driver), None, None, qry))

  private def init(db: String, ddl: String, inserts: Seq[String]): Unit = {
    Class.forName(Driver)
    val conn = DriverManager.getConnection(url(db))
    try {
      val st = conn.createStatement()
      st.executeUpdate(ddl)
      inserts.foreach(st.executeUpdate)
    } finally conn.close()
  }

  test("DECIMAL precision divergence maps to different Spark types and the positional gate names it") {
    init("decA", "CREATE TABLE t (id INT, price DECIMAL(12,2))",
      Seq("INSERT INTO t VALUES (1, 10.50)", "INSERT INTO t VALUES (2, 20.25)"))
    init("decB", "CREATE TABLE t (id INT, price DECIMAL(18,2))",
      Seq("INSERT INTO t VALUES (1, 10.50)", "INSERT INTO t VALUES (2, 20.25)"))
    val a = Sources.resolve(spark, jdbcSide("decA", "SELECT id, price FROM t"))
    val b = Sources.resolve(spark, jdbcSide("decB", "SELECT id, price FROM t"))
    // Derby folds unquoted identifiers to upper case — itself a dialect
    // divergence the name-insensitive positional gate absorbs
    assert(a.schema("PRICE").dataType == DecimalType(12, 2))
    assert(b.schema("PRICE").dataType == DecimalType(18, 2))
    val e = intercept[IllegalArgumentException] {
      Comparator.compare(a, b, CompareOptions(numBuckets = 16))
    }
    assert(e.getMessage.contains("position 1") && e.getMessage.contains("DecimalType(12,2)"))
    // the dialect fix lives where the reference puts it too: in the
    // pushed-down query — align the declared precision remotely
    val b2 = Sources.resolve(spark,
      jdbcSide("decB", "SELECT id, CAST(price AS DECIMAL(12,2)) AS price FROM t"))
    val rep = Comparator.compare(a, b2, CompareOptions(numBuckets = 16))
    assert(rep.identical)
    rep.release()
  }

  test("CHAR blank-padding is a real value difference; rtrim in the remote query aligns it") {
    init("chrA", "CREATE TABLE t (id INT, tag CHAR(10))",
      Seq("INSERT INTO t VALUES (1, 'abc')", "INSERT INTO t VALUES (2, 'defgh')"))
    init("chrB", "CREATE TABLE t (id INT, tag VARCHAR(10))",
      Seq("INSERT INTO t VALUES (1, 'abc')", "INSERT INTO t VALUES (2, 'defgh')"))
    val a = Sources.resolve(spark, jdbcSide("chrA", "SELECT id, tag FROM t"))
    val b = Sources.resolve(spark, jdbcSide("chrB", "SELECT id, tag FROM t"))
    // both map to string — the gate passes; the PAD bytes differ, and
    // a comparator that missed them would be lying
    val rep = Comparator.compare(a, b, CompareOptions(numBuckets = 16))
    assert(!rep.identical && rep.orphanSrc == 2 && rep.orphanTgt == 2)
    rep.release()
    val a2 = Sources.resolve(spark, jdbcSide("chrA", "SELECT id, RTRIM(tag) AS tag FROM t"))
    val rep2 = Comparator.compare(a2, b, CompareOptions(numBuckets = 16))
    assert(rep2.identical)
    rep2.release()
  }

  test("JDBC INT vs parquet BIGINT: gate blocks by default, ArityOnly + value-level hashing compare equal") {
    import spark.implicits._
    init("intA", "CREATE TABLE t (id INT, n INT)",
      Seq("INSERT INTO t VALUES (1, 100)", "INSERT INTO t VALUES (2, 200)"))
    val jdbc = Sources.resolve(spark, jdbcSide("intA", "SELECT id, n FROM t"))
    assert(jdbc.schema("N").dataType == IntegerType)
    val wide = Seq((1L, 100L), (2L, 200L)).toDF("id", "n") // bigint side
    intercept[IllegalArgumentException] {
      Comparator.compare(jdbc, wide, CompareOptions(numBuckets = 16))
    }
    // reference-faithful arity-only gate: hashes are value-level across
    // physical widths (rowHash widens int→long), so equal data is equal
    val rep = Comparator.compare(jdbc, wide,
      CompareOptions(numBuckets = 16, schemaCheck = SchemaCheck.ArityOnly))
    assert(rep.identical)
    rep.release()
  }
}
