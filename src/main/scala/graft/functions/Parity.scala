package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-parity primitives with the reference's in-database hashing
  * scheme — needed only when fingerprints must match the reference's
  * exactly (SURVEY §7.3); the default comparator fingerprint is the
  * cheaper commutative form in [[graft.diff.Comparator]].
  */
object Parity {

  /** PostgreSQL record-syntax canonical text of a row: `(a,b,"x y")`.
    *
    * The reference obtains this implicitly — PG renders the whole row
    * via `anyelement::text` (/root/reference/scribedb/postgres.py:21-22)
    * and Oracle imitates it by hand-concatenating columns wrapped in
    * parens (/root/reference/scribedb/oracle.py:107,170-188), double-
    * quoting values that contain whitespace via
    * `regexp_replace(value,'(\w*\s[^,)]*)','"\1"')`
    * (/root/reference/scribedb/oracle.py:60) and forcing
    * `NLS_TIMESTAMP_FORMAT='YYYY-MM-DD HH24:MI:SS'`
    * (/root/reference/scribedb/oracle.py:140-145). Here the same rules
    * are explicit Catalyst expressions (codegen'd, no UDF):
    *   - NULL → empty (PG record renders NULL as nothing)
    *   - string containing whitespace → wrapped in double quotes
    *   - timestamp → `yyyy-MM-dd HH:mm:ss`
    *   - everything else → plain text cast
    */
  def pgRecordText(df: DataFrame, cols: Seq[String] = Nil): Column = {
    val names = if (cols.nonEmpty) cols else df.schema.fieldNames.toSeq
    val fields = names.map { n =>
      val c = df.col(n)
      val rendered = df.schema(n).dataType match {
        case TimestampType | TimestampNTZType => date_format(c, "yyyy-MM-dd HH:mm:ss")
        case DateType                         => date_format(c, "yyyy-MM-dd")
        case StringType =>
          when(c.rlike("\\s"), concat(lit("\""), c, lit("\""))).otherwise(c)
        case _ => c.cast(StringType)
      }
      coalesce(rendered, lit(""))
    }
    concat(lit("("), concat_ws(",", fields: _*), lit(")"))
  }

  /** Per-bucket md5 over the newline-joined SORTED canonical rows —
    * byte-identical to `md5(string_agg(canon, chr(10) ORDER BY canon))`
    * but computed as a streaming fold: hash-partition by bucket so each
    * bucket lands wholly in one partition, sort within partitions by
    * (bucket, canon), then stream every row through one incremental
    * `MessageDigest.update`. Memory per bucket is O(1) — the digest
    * state — regardless of bucket size, so bucket count no longer has
    * to scale with data the way the previous `collect_list` +
    * `array_sort` form required (one bucket's full canon text in a
    * single task). Returns (bucket, fingerprint, n).
    */
  def sortedMd5(rows: DataFrame, bucket: Column, canon: Column): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val prepared = rows
      .select(bucket.cast(StringType).as("bucket"), canon.cast(StringType).as("canon"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "canon")
    prepared.as[(String, String)].mapPartitions { it =>
      val hexDigits = "0123456789abcdef".toCharArray
      def hex(b: Array[Byte]): String = {
        val out = new Array[Char](b.length * 2)
        var i = 0
        while (i < b.length) {
          out(2 * i) = hexDigits((b(i) >> 4) & 0xf)
          out(2 * i + 1) = hexDigits(b(i) & 0xf)
          i += 1
        }
        new String(out)
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      val nl = Array[Byte]('\n')
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var cur: String = null
      var n = 0L
      for ((b, c) <- it) {
        if (b != cur) {
          if (cur != null) out += ((cur, hex(md.digest()), n)) // digest() resets
          cur = b; n = 0L
        }
        if (n > 0L) md.update(nl)
        md.update(c.getBytes("UTF-8"))
        n += 1
      }
      if (cur != null) out += ((cur, hex(md.digest()), n))
      out.iterator
    }.toDF("bucket", "fingerprint", "n")
  }

  /** Ordered chained-MD5 fingerprint per bucket — the reference's exact
    * aggregate semantics: state ← `upper(md5(state ‖ rowText))`, init
    * `''`, folded in canonical-text order
    * (PG DDL /root/reference/scribedb/postgres.py:17-30; Oracle ODCI
    * /root/reference/scribedb/oracle.py:41-83).
    *
    * The fold is non-commutative, so it CANNOT be a distributed
    * mergeable aggregate — the reference's own Oracle Merge
    * (`md5(s1‖s2)`, /root/reference/scribedb/oracle.py:77-81) disagrees
    * with its serial result, proving it never ran parallel. The honest
    * distributed form (SURVEY §7.3): hash-partition by bucket so each
    * bucket lands wholly in one partition, sort within partitions by
    * (bucket, rowText) — an explicit, single-sourced order instead of
    * the reference's fragile user-ORDER-BY contract — then fold each
    * consecutive bucket run in one pass. Shuffle volume = the canonical
    * texts, once; bucket count and size are the planner's knobs.
    */
  def chainedMd5(rows: DataFrame, bucket: Column, canon: Column): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val prepared = rows
      .select(bucket.cast(StringType).as("bucket"), canon.cast(StringType).as("canon"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "canon")
    prepared.as[(String, String)].mapPartitions { it =>
      // table-lookup hex: a per-byte "%02X".format allocates a
      // Formatter per call and dominated the fold (measured ~40s at
      // 600k rows vs ~3s with the table)
      val hexDigits = "0123456789ABCDEF".toCharArray
      def hex(b: Array[Byte]): String = {
        val out = new Array[Char](b.length * 2)
        var i = 0
        while (i < b.length) {
          out(2 * i) = hexDigits((b(i) >> 4) & 0xf)
          out(2 * i + 1) = hexDigits(b(i) & 0xf)
          i += 1
        }
        new String(out)
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var cur: String = null
      var state = ""
      for ((b, c) <- it) {
        if (b != cur) {
          if (cur != null) out += ((cur, state))
          cur = b; state = ""
        }
        md.reset()
        state = hex(md.digest((state + c).getBytes("UTF-8")))
      }
      if (cur != null) out += ((cur, state))
      out.iterator
    }.toDF("bucket", "chain_md5")
  }
}
