package graft.layers

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Per-batch zone maps for [[AtomicAppend]] tables — the data-skipping
  * role of the per-file stats Delta keeps in `_delta_log` (the reference
  * relies on exactly those for every selective Trino scan over its
  * lakehouse, `docs/ARCHITECTURE.md:167-174`): min/max/null-count per
  * column per committed batch, stored as a `_STATS` metadata file INSIDE
  * the batch directory, so a reader with a selective predicate can drop
  * whole batch directories from the scan without opening a single
  * parquet footer. At 100 TB the fact table is thousands of batch dirs;
  * a predicate on a clustered column turns O(table) scans into
  * O(matching batches) — this file is the decision kernel, and
  * [[AtomicAppend.compactClustered]] (z-order fold) is what makes the
  * per-batch ranges tight enough to decide with.
  *
  * SOUNDNESS is the whole contract: a batch is skipped only when its
  * stats PROVE no row can satisfy the predicate, under Spark's own
  * comparison semantics. Everything uncertain keeps the batch:
  *   - only top-level `AND` conjuncts of simple comparisons against
  *     literals prune (`=`, `<=>`, `<`, `<=`, `>`, `>=`, `IN`,
  *     `IS [NOT] NULL`); any other conjunct contributes nothing;
  *   - a batch with no `_STATS`, or no entry for the column, is kept;
  *   - NULL rows never satisfy a comparison, so min/max (which ignore
  *     nulls) decide comparisons soundly; an all-null column (nulls ==
  *     rows) proves every comparison empty;
  *   - strings compare as UNSIGNED UTF-8 BYTES — Spark's UTF8_BINARY
  *     collation — not Java `String.compareTo` (UTF-16 code units),
  *     which disagrees with it above the BMP (U+FF5A sorts after
  *     U+10000 in UTF-16, before it in UTF-8 — an unsound skip if used);
  *   - numeric bounds are EXACT `BigDecimal`s (`new BigDecimal(double)`
  *     is the value's binary expansion, not its decimal rendering);
  *     NaN bounds are unusable (kept conservative), ±Inf are ordered
  *     sentinels;
  *   - a literal prunes only within its column's TYPE FAMILY. Mixed
  *     integral↔floating comparisons go through Spark's double
  *     promotion, which ROUNDS above 2^52 — so they prune only when
  *     literal and both bounds sit inside ±2^52 (where the promotion is
  *     exact); integral↔decimal is exact at any magnitude; timestamp,
  *     date, boolean and string never mix.
  *
  * The file format is line-oriented metadata (the [[ScalarSidecar]]
  * discipline — driver-written, no executors, idempotent overwrite):
  * names base64-coded so no column name can break the framing.
  */
private[graft] object BatchStats {

  val FileName = "_STATS"

  // ---------------------------------------------------------------- model

  /** A normalized bound value: one ordered domain per type family. */
  sealed trait Bound
  /** Exact numeric (integral, floating binary expansion, decimal,
    * timestamp micros, date days, boolean 0/1). */
  final case class NumB(v: BigDecimal) extends Bound
  /** UTF-8 bytes of a string, compared unsigned lexicographically. */
  final case class BytesB(b: Array[Byte]) extends Bound
  case object PosInf extends Bound
  case object NegInf extends Bound

  /** Type family tag persisted with each column's stats; a literal only
    * prunes against a compatible family (see [[comparable]]).
    */
  object Family {
    val Integral = "i"; val Floating = "f"; val Decim = "d"
    val Str = "s"; val Ts = "t"; val Dt = "a"; val Bool = "b"
  }

  final case class ColStats(family: String, nulls: Long,
      min: Option[Bound], max: Option[Bound]) {
    def allNull(rows: Long): Boolean = nulls == rows
  }

  final case class Stats(rows: Long, cols: Map[String, ColStats]) {
    private[BatchStats] def col(name: String): Option[ColStats] =
      cols.get(name).orElse(cols.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      })
  }

  // ------------------------------------------------------------ ordering

  /** Compare two bounds of the SAME family; None when incomparable
    * (mixed Num/Bytes — cannot happen for same-family values, kept as a
    * conservative guard).
    */
  def cmp(a: Bound, b: Bound): Option[Int] = (a, b) match {
    case (NumB(x), NumB(y)) => Some(x.compare(y))
    case (BytesB(x), BytesB(y)) => Some(compareBytes(x, y))
    case (PosInf, PosInf) => Some(0)
    case (NegInf, NegInf) => Some(0)
    case (PosInf, _) => Some(1)
    case (_, PosInf) => Some(-1)
    case (NegInf, _) => Some(-1)
    case (_, NegInf) => Some(1)
    case _ => None
  }

  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  // --------------------------------------------- normalization (external)

  private val Exact52 = BigDecimal(1L << 52)

  /** Family tag of a Catalyst type; None = stats not collectable. */
  def familyOf(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(Family.Integral)
    case FloatType | DoubleType => Some(Family.Floating)
    case _: DecimalType => Some(Family.Decim)
    case StringType => Some(Family.Str)
    case TimestampType => Some(Family.Ts)
    case DateType => Some(Family.Dt)
    case BooleanType => Some(Family.Bool)
    case _ => None
  }

  /** Normalize an EXTERNAL value (a collected agg Row cell) to its
    * bound. None = no usable bound (null input, or NaN).
    */
  def normExternal(v: Any): Option[Bound] = v match {
    case null => None
    case b: Boolean => Some(NumB(if (b) BigDecimal(1) else BigDecimal(0)))
    case b: Byte => Some(NumB(BigDecimal(b.toLong)))
    case s: Short => Some(NumB(BigDecimal(s.toLong)))
    case i: Int => Some(NumB(BigDecimal(i.toLong)))
    case l: Long => Some(NumB(BigDecimal(l)))
    case f: Float => normDouble(f.toDouble)
    case d: Double => normDouble(d)
    case d: java.math.BigDecimal => Some(NumB(BigDecimal(d)))
    case d: BigDecimal => Some(NumB(d))
    case s: String => Some(BytesB(s.getBytes(StandardCharsets.UTF_8)))
    case t: java.sql.Timestamp =>
      val us = Math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000L) % 1000000L
      Some(NumB(BigDecimal(us)))
    case i: java.time.Instant =>
      Some(NumB(BigDecimal(i.getEpochSecond * 1000000L + i.getNano / 1000L)))
    case d: java.sql.Date => Some(NumB(BigDecimal(d.toLocalDate.toEpochDay)))
    case d: java.time.LocalDate => Some(NumB(BigDecimal(d.toEpochDay)))
    case _ => None
  }

  private def normDouble(d: Double): Option[Bound] =
    if (d.isNaN) None // Spark orders NaN greatest: a NaN max tells us nothing
    else if (d == Double.PositiveInfinity) Some(PosInf)
    else if (d == Double.NegativeInfinity) Some(NegInf)
    else Some(NumB(BigDecimal(new java.math.BigDecimal(d)))) // exact binary expansion

  /** Normalize a Catalyst LITERAL (internal representation) with its
    * family tag. None = unusable for pruning.
    */
  def normLiteral(lit: Literal): Option[(String, Bound)] = {
    val fam = familyOf(lit.dataType)
    if (lit.value == null || fam.isEmpty) return None
    val bound = (lit.dataType, lit.value) match {
      case (DateType, days: Int) => Some(NumB(BigDecimal(days.toLong)))
      case (TimestampType, us: Long) => Some(NumB(BigDecimal(us)))
      case (StringType, s) =>
        Some(BytesB(s.toString.getBytes(StandardCharsets.UTF_8)))
      case (_: DecimalType, d: Decimal) => Some(NumB(d.toBigDecimal))
      case (FloatType, f: Float) => normDouble(f.toDouble)
      case (DoubleType, d: Double) => normDouble(d)
      case (BooleanType, b: Boolean) =>
        Some(NumB(if (b) BigDecimal(1) else BigDecimal(0)))
      case (ByteType | ShortType | IntegerType | LongType, n) =>
        normExternal(n)
      case _ => None
    }
    bound.map(b => (fam.get, b))
  }

  /** Can a `litFam` literal soundly prune against a `colFam` column's
    * bounds? Same family always; integral↔decimal is exact; the
    * integral/decimal↔floating mix goes through Spark's DOUBLE promotion
    * which rounds above 2^52, so it is sound only when every value
    * involved sits in the exactness region.
    */
  def comparable(colFam: String, litFam: String,
      bounds: Seq[Bound], lit: Bound): Boolean = {
    import Family._
    if (colFam == litFam) return true
    (colFam, litFam) match {
      case (Integral, Decim) | (Decim, Integral) => true
      case (Floating, Integral) | (Floating, Decim) |
           (Integral, Floating) | (Decim, Floating) =>
        (bounds :+ lit).forall {
          case NumB(v) => v.abs <= Exact52
          case _ => false // ±Inf bound in a mixed compare: stay conservative
        }
      case _ => false
    }
  }

  // ----------------------------------------------------------- predicate

  /** The compiled pruning decision tree of a predicate. Compiled ONCE
    * per read from the OPTIMIZED logical plan of a probe
    * `reader.filter(predicate)` — which buys, for free: resolved
    * attribute names, type-coercion casts constant-FOLDED on the literal
    * side (`to_timestamp('2024-01-11')` arrives as a timestamp literal),
    * and the optimizer's inferred `IsNotNull` constraints (an all-null
    * batch prunes on any null-intolerant predicate without us reasoning
    * about it). Evaluated per batch against its [[Stats]].
    */
  sealed trait Node
  private final case class AndN(kids: Seq[Node]) extends Node
  private final case class OrN(kids: Seq[Node]) extends Node
  /** A conjunct we cannot reason about: never proves anything. */
  private case object Opaque extends Node
  /** `c = NULL`-style conjuncts: empty on every batch. */
  private case object AlwaysEmptyN extends Node
  private final case class CmpN(col: String, op: String,
      litFam: String, lit: Bound) extends Node
  private final case class InN(col: String, lits: Seq[(String, Bound)]) extends Node
  private final case class NullN(col: String, isNull: Boolean) extends Node

  /** Compile the pruning tree from an (analyzed+optimized) plan's Filter
    * conditions. `filtered` is a throwaway `reader.filter(predicate)`
    * over ONE committed batch — its resolution stands in for every
    * batch's (sound: a batch whose actual schema disagrees fails the
    * per-batch FAMILY check and is kept). Any failure to plan compiles
    * to "prune nothing".
    */
  def compile(filtered: DataFrame): Node =
    try {
      import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
      filtered.queryExecution.optimizedPlan match {
        // the optimizer proved the predicate unsatisfiable (`c = NULL`,
        // contradictions, literal false): the whole Filter collapsed to
        // an empty relation, so EVERY batch prunes
        case l: LocalRelation if l.data.isEmpty => AlwaysEmptyN
        case plan =>
          AndN(plan.collect { case f: Filter => f.condition }.map(build))
      }
    } catch { case scala.util.control.NonFatal(_) => Opaque }

  private def build(e: Expression): Node = e match {
    case And(l, r) => AndN(Seq(build(l), build(r)))
    case Or(l, r) => OrN(Seq(build(l), build(r)))
    case EqualTo(a, l: Literal) if attrName(a).isDefined => cmpNode(a, l, "eq")
    case EqualTo(l: Literal, a) if attrName(a).isDefined => cmpNode(a, l, "eq")
    case EqualNullSafe(a, l: Literal) if attrName(a).isDefined => eqNullSafe(a, l)
    case EqualNullSafe(l: Literal, a) if attrName(a).isDefined => eqNullSafe(a, l)
    case GreaterThan(a, l: Literal) if attrName(a).isDefined => cmpNode(a, l, "gt")
    case GreaterThan(l: Literal, a) if attrName(a).isDefined => cmpNode(a, l, "lt")
    case GreaterThanOrEqual(a, l: Literal) if attrName(a).isDefined => cmpNode(a, l, "ge")
    case GreaterThanOrEqual(l: Literal, a) if attrName(a).isDefined => cmpNode(a, l, "le")
    case LessThan(a, l: Literal) if attrName(a).isDefined => cmpNode(a, l, "lt")
    case LessThan(l: Literal, a) if attrName(a).isDefined => cmpNode(a, l, "gt")
    case LessThanOrEqual(a, l: Literal) if attrName(a).isDefined => cmpNode(a, l, "le")
    case LessThanOrEqual(l: Literal, a) if attrName(a).isDefined => cmpNode(a, l, "ge")
    case In(a, lits) if attrName(a).isDefined && lits.forall(_.isInstanceOf[Literal]) =>
      inNode(a, lits.collect { case l: Literal => l })
    case InSet(a, hset) if attrName(a).isDefined =>
      // InSet members are INTERNAL values of the child's type — wrap
      // with the raw constructor, not Literal.create (no re-conversion)
      inNode(a, hset.toSeq.map(v => Literal(v, litType(a))))
    case IsNull(a) if attrName(a).isDefined =>
      NullN(attrName(a).get, isNull = true)
    case IsNotNull(a) if attrName(a).isDefined =>
      NullN(attrName(a).get, isNull = false)
    case _ => Opaque
  }

  private def litType(a: Expression): DataType = a match {
    case c: Cast => c.dataType
    case other => other.dataType
  }

  private def eqNullSafe(a: Expression, l: Literal): Node =
    if (l.value == null) NullN(attrName(a).get, isNull = true)
    else normLiteral(l).fold[Node](Opaque) { case (fam, b) =>
      CmpN(attrName(a).get, "eq", fam, b)
    }

  private def cmpNode(a: Expression, l: Literal, op: String): Node =
    if (l.value == null) AlwaysEmptyN // comparison with NULL is never true
    else normLiteral(l).fold[Node](Opaque) { case (fam, b) =>
      CmpN(attrName(a).get, op, fam, b)
    }

  private def inNode(a: Expression, lits: Seq[Literal]): Node = {
    // IN's null members can never MATCH (x = NULL is null), so only the
    // non-null members decide; an all-null / empty list matches nothing
    val nn = lits.filter(_.value != null)
    if (nn.isEmpty) AlwaysEmptyN
    else {
      val normed = nn.map(normLiteral)
      if (normed.exists(_.isEmpty)) Opaque
      else InN(attrName(a).get, normed.flatten)
    }
  }

  /** The column behind a (possibly cast-wrapped) attribute. A cast
    * unwraps ONLY when it embeds the column's values into the wider
    * domain exactly or under the guarded double promotion — i.e. the
    * casts type coercion actually inserts on the COLUMN side of a
    * numeric comparison: integral→wider integral and float→double are
    * exact; integral→double rounds above 2^53 but lands in the
    * Floating-vs-Integral path of [[comparable]], whose 2^52 exactness
    * region keeps it sound. Everything else (date→timestamp is
    * session-timezone-dependent, double→integral truncates,
    * integral→float rounds above 2^24 with no guard) stays Opaque.
    */
  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.last)
    case a: AttributeReference => Some(a.name)
    case c: Cast if castIsSoundEmbedding(c.child.dataType, c.dataType) =>
      attrName(c.child)
    case _ => None
  }

  private def intWidth(dt: DataType): Int = dt match {
    case ByteType => 1; case ShortType => 2; case IntegerType => 4
    case LongType => 8; case _ => 0
  }

  private def castIsSoundEmbedding(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (f, t) if intWidth(f) > 0 && intWidth(t) >= intWidth(f) => true
      case (f, DoubleType) if intWidth(f) > 0 => true // guarded by comparable()
      case (f, _: DecimalType) if intWidth(f) > 0 => true // exact at any width
      case (FloatType, DoubleType) => true
      case _ => false
    }

  /** Walk the compiled tree with a caller-supplied EQUALITY oracle:
    * `provablyAbsent(col, litFam, lit)` decides Eq members; everything
    * else is uncertain. The evaluation shell for MEMBERSHIP sidecars
    * ([[BatchBloom]]) that can refute point lookups but not ranges.
    */
  def evalWith(node: Node)(
      provablyAbsent: (String, String, Bound) => Boolean): Boolean = node match {
    case AndN(kids) => kids.exists(evalWith(_)(provablyAbsent))
    case OrN(kids) => kids.forall(evalWith(_)(provablyAbsent))
    case AlwaysEmptyN => true
    case CmpN(col, "eq", litFam, lit) => provablyAbsent(col, litFam, lit)
    case InN(col, lits) =>
      lits.nonEmpty && lits.forall { case (f, b) => provablyAbsent(col, f, b) }
    case _ => false
  }

  /** The columns behind the tree's Eq/IN leaves — the only sketches a
    * membership sidecar needs to deserialize for this predicate (empty
    * set = pure range scan, skip the `_BLOOM` read entirely).
    */
  def equalityColumns(node: Node): Set[String] = node match {
    case AndN(kids) => kids.flatMap(equalityColumns).toSet
    case OrN(kids) => kids.flatMap(equalityColumns).toSet
    case CmpN(col, "eq", _, _) => Set(col)
    case InN(col, _) => Set(col)
    case _ => Set.empty
  }

  /** True iff `stats` PROVES the batch has no row satisfying the
    * compiled predicate. False on any uncertainty.
    */
  def mustBeEmpty(stats: Stats, node: Node): Boolean = node match {
    case AndN(kids) => kids.exists(mustBeEmpty(stats, _))
    case OrN(kids) => kids.forall(mustBeEmpty(stats, _))
    case Opaque => false
    case AlwaysEmptyN => true
    case NullN(col, isNull) =>
      stats.col(col).exists { cs =>
        if (isNull) cs.nulls == 0 else cs.allNull(stats.rows)
      }
    case CmpN(col, op, litFam, lit) =>
      stats.col(col).exists { cs =>
        if (cs.allNull(stats.rows)) true // no non-null row compares true
        else (cs.min, cs.max) match {
          case (Some(lo), Some(hi))
              if comparable(cs.family, litFam, Seq(lo, hi), lit) =>
            provablyOutside(op, lo, hi, lit)
          case _ => false
        }
      }
    case InN(col, lits) =>
      stats.col(col).exists { cs =>
        if (cs.allNull(stats.rows)) true
        else (cs.min, cs.max) match {
          case (Some(lo), Some(hi)) =>
            lits.forall { case (fam, lit) =>
              comparable(cs.family, fam, Seq(lo, hi), lit) &&
                provablyOutside("eq", lo, hi, lit)
            }
          case _ => false
        }
      }
  }

  private[graft] def provablyOutside(op: String, lo: Bound, hi: Bound, lit: Bound): Boolean = {
    def lt(a: Bound, b: Bound) = cmp(a, b).exists(_ < 0)
    def le(a: Bound, b: Bound) = cmp(a, b).exists(_ <= 0)
    op match {
      case "eq" => lt(lit, lo) || lt(hi, lit)
      case "gt" => le(hi, lit) // need some v > lit; max <= lit forbids it
      case "ge" => lt(hi, lit)
      case "lt" => le(lit, lo)
      case "le" => lt(lit, lo)
      case _ => false
    }
  }

  // -------------------------------------------------------- compute/merge

  /** Column names of `df`'s schema matching `cols` (case-insensitive)
    * whose type supports stats; silently drops the rest — a stats column
    * that stops existing after schema evolution must not fail appends.
    */
  private def statsFields(df: DataFrame, cols: Seq[String]): Seq[StructField] =
    cols.flatMap(c => df.schema.fields.find(_.name.equalsIgnoreCase(c)))
      .filter(f => familyOf(f.dataType).isDefined)

  /** One aggregate pass over `df` → its Stats. The scan is column-pruned
    * to the stats columns; on an append this reads back only the batch
    * just written (Delta computes the same stats inside its writer — the
    * explicit pass keeps the write path a plain parquet write).
    */
  def compute(df: DataFrame, cols: Seq[String]): Stats = {
    val fields = statsFields(df, cols)
    val aggs = F.count(F.lit(1)).as("__rows") +: fields.flatMap { f =>
      Seq(F.min(F.col(f.name)), F.max(F.col(f.name)), F.count(F.col(f.name)))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    fromAggRow(row, fields, offset = 1)
  }

  /** Decode one collected agg row laid out as
    * [rows, (min, max, nonNullCount)*] starting at `offset`.
    */
  def fromAggRow(row: Row, fields: Seq[StructField], offset: Int): Stats = {
    val rows = row.getLong(offset - 1)
    val cols = fields.zipWithIndex.map { case (f, i) =>
      val base = offset + i * 3
      val nonNull = row.getLong(base + 2)
      f.name -> ColStats(familyOf(f.dataType).get, rows - nonNull,
        normExternal(row.get(base)), normExternal(row.get(base + 1)))
    }.toMap
    Stats(rows, cols)
  }

  /** The aggregate columns for computing Stats DURING a write job via
    * `Dataset.observe` — the zero-extra-pass sibling of [[compute]]:
    * Delta computes file stats inside its writer, and observed metrics
    * are the Spark-native way to do the same without abandoning the
    * plain parquet write (exactly-once per row by the Observation
    * contract, so the stats describe exactly the rows the write landed).
    * Returns (the stats-capable fields, the named metric columns);
    * decode the finished query's metric map with [[fromObserved]].
    */
  def observationAggs(df: DataFrame, cols: Seq[String]): (Seq[StructField], Seq[Column]) = {
    val fields = statsFields(df, cols)
    val aggs = F.count(F.lit(1)).as("__rows") +: fields.zipWithIndex.flatMap {
      case (f, i) => Seq(
        F.min(F.col(f.name)).as(s"__min$i"),
        F.max(F.col(f.name)).as(s"__max$i"),
        F.count(F.col(f.name)).as(s"__cnt$i"))
    }
    (fields, aggs)
  }

  /** Decode an `Observation.get` metric map produced by
    * [[observationAggs]]' columns into Stats.
    */
  def fromObserved(metrics: Map[String, Any], fields: Seq[StructField]): Stats = {
    val rows = metrics("__rows").asInstanceOf[Long]
    val cols = fields.zipWithIndex.map { case (f, i) =>
      val nonNull = metrics(s"__cnt$i").asInstanceOf[Long]
      f.name -> ColStats(familyOf(f.dataType).get, rows - nonNull,
        normExternal(metrics(s"__min$i")), normExternal(metrics(s"__max$i")))
    }.toMap
    Stats(rows, cols)
  }

  /** [[compute]] per group in ONE aggregate pass — the clustered
    * compaction's stats: one job over the freshly-written fold, however
    * many z-range batches it produced. `groupCol` must be integral.
    */
  def computeGrouped(df: DataFrame, groupCol: String,
      cols: Seq[String]): Map[Long, Stats] = {
    val fields = statsFields(df, cols)
    val aggs = F.count(F.lit(1)).as("__rows") +: fields.flatMap { f =>
      Seq(F.min(F.col(f.name)), F.max(F.col(f.name)), F.count(F.col(f.name)))
    }
    df.groupBy(F.col(groupCol).cast("long").as("__g"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(row => row.getLong(0) -> fromAggRow(row, fields, offset = 2))
      .toMap
  }

  /** Merge batch stats for a compaction fold: exact without rescanning —
    * min of mins, max of maxes, sums of rows/nulls. Only columns present
    * in EVERY input with one family survive (the rest stay unpruned on
    * the folded batch, conservative as always); a column with an
    * unusable bound anywhere keeps null counts but loses that bound.
    */
  def merge(all: Seq[Stats]): Stats = {
    require(all.nonEmpty)
    val rows = all.map(_.rows).sum
    val shared = all.map(_.cols.keySet).reduce(_ intersect _)
    def fold(bounds: Seq[Option[Bound]], wantMin: Boolean): Option[Bound] = {
      if (bounds.exists(_.isEmpty)) return None
      val flat = bounds.flatten
      var acc = flat.head
      var i = 1
      while (i < flat.length) {
        cmp(acc, flat(i)) match {
          case Some(c) => if ((c <= 0) != wantMin) acc = flat(i)
          case None => return None // incomparable: drop the bound
        }
        i += 1
      }
      Some(acc)
    }
    val cols = shared.flatMap { name =>
      val cs = all.map(_.cols(name))
      if (cs.map(_.family).distinct.size != 1) None
      else Some(name -> ColStats(cs.head.family, cs.map(_.nulls).sum,
        fold(cs.map(_.min), wantMin = true),
        fold(cs.map(_.max), wantMin = false)))
    }.toMap
    Stats(rows, cols)
  }

  // -------------------------------------------------------------- codec

  private def b64(s: String) =
    java.util.Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String) =
    new String(java.util.Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  private def encBound(b: Option[Bound]): String = b match {
    case None => "-"
    case Some(PosInf) => "+inf"
    case Some(NegInf) => "-inf"
    case Some(NumB(v)) => s"n:${v.underlying.toString}"
    case Some(BytesB(bs)) => s"s:${java.util.Base64.getEncoder.encodeToString(bs)}"
  }

  private def decBound(s: String): Option[Bound] = s match {
    case "-" => None
    case "+inf" => Some(PosInf)
    case "-inf" => Some(NegInf)
    case v if v.startsWith("n:") =>
      Some(NumB(BigDecimal(new java.math.BigDecimal(v.drop(2)))))
    case v if v.startsWith("s:") =>
      Some(BytesB(java.util.Base64.getDecoder.decode(v.drop(2))))
    case other => throw new IllegalArgumentException(
      s"_STATS: unknown bound encoding '$other' — written by a newer engine?")
  }

  def encode(stats: Stats): String = {
    val header = Seq("v1", s"rows\t${stats.rows}")
    val cols = stats.cols.toSeq.sortBy(_._1).map { case (name, cs) =>
      Seq("col", b64(name), cs.family, cs.nulls.toString,
        encBound(cs.min), encBound(cs.max)).mkString("\t")
    }
    (header ++ cols).mkString("\n")
  }

  def decode(content: String): Stats = {
    val lines = content.split("\n").toSeq
    require(lines.headOption.contains("v1"),
      s"_STATS: unknown version header '${lines.headOption.getOrElse("")}'")
    val rows = lines.collectFirst {
      case l if l.startsWith("rows\t") => l.stripPrefix("rows\t").toLong
    }.getOrElse(throw new IllegalArgumentException("_STATS: missing rows line"))
    val cols = lines.filter(_.startsWith("col\t")).map { l =>
      val Array(_, name, fam, nulls, lo, hi) = l.split("\t", 6)
      unb64(name) -> ColStats(fam, nulls.toLong, decBound(lo), decBound(hi))
    }.toMap
    Stats(rows, cols)
  }

  // ----------------------------------------------------------------- io

  /** Idempotently write `stats` as the batch dir's `_STATS` file. */
  def write(fs: FileSystem, batchDir: Path, stats: Stats): Unit = {
    val out = graft.runtime.MetaIO.create(fs, new Path(batchDir, FileName))
    try out.write(encode(stats).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The batch dir's stats; None when absent (batch never prunable). */
  def read(fs: FileSystem, batchDir: Path): Option[Stats] = {
    val p = new Path(batchDir, FileName)
    try {
      val in = graft.runtime.MetaIO.open(fs, p)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(decode(content))
    } catch { case _: java.io.FileNotFoundException => None }
  }
}
