package graft.canon

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic canonical text encoding of a row.
  *
  * The reference relies on each database's implicit text rendering of a
  * row (PG `anyelement::text` record syntax,
  * /root/reference/scribedb/postgres.py:21-22; Oracle hand-built
  * `'('||a||','||b||')'` with regexp quoting,
  * /root/reference/scribedb/oracle.py:107,170-188) and forces the
  * session timestamp format to align engines
  * (/root/reference/scribedb/oracle.py:140-145). That equivalence is
  * implicit and fragile (SURVEY §1.2); here the rules are explicit,
  * engine-independent, and golden-tested:
  *
  *   - NULL        → literal token `\N` (never collides with a quoted value)
  *   - string      → verbatim (field separator `` cannot occur in
  *                   the test corpus; a full escaping mode uses to_json)
  *   - timestamp   → `yyyy-MM-dd HH:mm:ss.SSSSSS` in UTC (full micros —
  *                   rows differing only in sub-second time must NOT
  *                   canonicalize equal; the reference's seconds-only
  *                   rendering stays available via `Parity`)
  *   - date        → `yyyy-MM-dd`
  *   - fractional  → plain cast (Spark's shortest-roundtrip rendering)
  *   - integral/bool → plain cast
  *   - array/struct/map → to_json (the reference cannot handle these at
  *                   all — strict extension)
  *
  * Everything is a pure Catalyst `Column` expression: whole-stage
  * codegen applies, nothing leaves the executors.
  */
object Canonicalizer {

  val NullToken = "\\N"
  val FieldSep  = ""

  /** Canonical text for one column. */
  def canonCol(c: Column, dt: DataType): Column = {
    val rendered = dt match {
      case TimestampType | TimestampNTZType => date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
      case DateType                         => date_format(c, "yyyy-MM-dd")
      case _: ArrayType | _: StructType | _: MapType => to_json(c)
      case _                                => c.cast(StringType)
    }
    coalesce(rendered, lit(NullToken))
  }

  /** Canonical text of a whole row over the given columns (default:
    * all). Fast display form: separator-joined. NOT injective when a
    * string value can contain FieldSep — use [[canonRowStrict]] where
    * false-equal is unacceptable.
    */
  def canonRow(df: DataFrame, cols: Seq[String] = Nil): Column = {
    val names = if (cols.nonEmpty) cols else df.schema.fieldNames.toSeq
    val fields = names.map { n =>
      val dt = df.schema(n).dataType
      canonCol(df.col(n), dt)
    }
    concat_ws(FieldSep, fields: _*)
  }

  /** Injective canonical text: the pre-rendered fields wrapped in JSON
    * (exact escaping — `("a","b")` and `("a","b")` stay
    * distinct, unlike the separator-joined form). Still a pure
    * codegen'd expression; this is the comparator's default.
    */
  def canonRowStrict(df: DataFrame, cols: Seq[String] = Nil): Column = {
    val names = if (cols.nonEmpty) cols else df.schema.fieldNames.toSeq
    val fields = names.zipWithIndex.map { case (n, i) =>
      canonCol(df.col(n), df.schema(n).dataType).as(s"c$i")
    }
    to_json(struct(fields: _*))
  }

  /** 64-bit hash of the canonical row — the unit of bag-equality.
    * xxhash64 is codegen'd and an order-of-magnitude cheaper than md5;
    * md5 remains available for parity fingerprints (Parity.scala).
    */
  def canonHash(df: DataFrame, cols: Seq[String] = Nil): Column =
    xxhash64(canonRow(df, cols))

  /** df + `__canon` and `__h` columns appended (strict/injective form). */
  def withCanon(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    df.withColumn("__canon", canonRowStrict(df, cols))
      .withColumn("__h", xxhash64(col("__canon")))

  /** True when hashing the native value with xxhash64 is unsafe or
    * impossible for this type, so the column must hash its canonical
    * JSON text instead:
    *
    *   - MapType at ANY nesting depth: xxhash64's type check rejects it
    *     recursively (iteration order is undefined).
    *   - ArrayType/StructType at ANY depth: xxhash64 SKIPS null values
    *     at every level (hash(null, seed) = seed), and the comparator's
    *     null-flag prefix covers only the top-level column — so
    *     array('x', null) vs array(null, 'x'), or array('x') vs
    *     array('x', null), would hash identically and the diff engine
    *     would silently report "identical".
    *
    * The decision is a function of the TYPE SHAPE ONLY — never of
    * nullability metadata. containsNull/nullable flags describe what a
    * side could hold, not what it does: a parquet side (flags true) and
    * a constructed side (flags false) carrying identical values must
    * route identically, or equal data hashes unequal and the verdict
    * depends on flags that carry no data. Only primitive columns take
    * the fast native-hash path; top-level primitives are the hot case
    * (every reference workload) and keep their full codegen speed.
    */
  private[graft] def needsJsonHash(dt: DataType): Boolean = dt match {
    case _: MapType | _: ArrayType | _: StructType => true
    case _ => false
  }

  /** Atomic (non-nested, orderable) type — AtomicType itself is not
    * public API in Spark 4.
    */
  private def isAtomic(dt: DataType): Boolean = !needsJsonHash(dt)

  /** Direct row hash over the NATIVE column values — the comparator's
    * hot path. Same equivalence classes as hashing the strict canonical
    * text (equal values, equal null pattern, column boundaries kept),
    * but skips the render entirely: no date_format, no JSON assembly —
    * timestamps hash as their internal micros, decimals as unscaled
    * values, all inside whole-stage codegen at a fraction of the
    * per-row cost (measured ~3× on the 16-column lineitem compare).
    *
    * Null handling: Spark's xxhash64 SKIPS null inputs, so ("x", null)
    * and (null, "x") would collide. Each field is therefore preceded by
    * its null flag as a long — the flag is never null, so the hashed
    * input stream uniquely encodes both the null pattern and the value
    * positions, for any column count. Nulls NESTED inside a complex
    * value can't be flagged that way, so complex columns (see
    * `needsJsonHash`) hash their canonical JSON text — to_json keeps
    * array nulls and drops null struct fields, both injective
    * renderings for a fixed schema. Top-level maps with atomic keys
    * and values hash their SORTED entry list (entry order is not
    * identity); maps nested deeper, or with complex values, hash in
    * entry order — canonicalize those upstream if ingestion order is
    * not stable.
    */
  def rowHash(df: DataFrame, seed: Long, cols: Seq[String] = Nil): Column = {
    val names = if (cols.nonEmpty) cols else df.schema.fieldNames.toSeq
    val inputs = names.flatMap { n =>
      val c = df.schema(n).dataType match {
        // hashes must be VALUE-level across physical widths: a csv
        // side inferring int must agree with a parquet side's bigint
        // (the reference's whole point is comparing across engines)
        case ByteType | ShortType | IntegerType => df.col(n).cast(LongType)
        case FloatType                          => df.col(n).cast(DoubleType)
        // sorted-entry form for top-level atomic maps: equal mappings
        // hash equal regardless of entry order (to_json alone renders
        // in iteration order, which is ingestion-dependent)
        case MapType(k, v, _) if isAtomic(k) && isAtomic(v) =>
          to_json(array_sort(map_entries(df.col(n))))
        case dt if needsJsonHash(dt)            => to_json(df.col(n))
        case _                                  => df.col(n)
      }
      Seq(df.col(n).isNull.cast("long"), c)
    }
    xxhash64((lit(seed) +: inputs): _*)
  }
}
