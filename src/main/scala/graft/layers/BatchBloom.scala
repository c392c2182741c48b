package graft.layers

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Per-batch BLOOM FILTER sidecars for [[AtomicAppend]] tables — the
  * point-lookup half of data skipping. Zone maps ([[BatchStats]]) prove
  * absence by RANGE, which is useless exactly where point lookups live:
  * a high-cardinality key scattered over arrival-ordered batches spans
  * the full domain in every batch, so min/max never excludes anything.
  * A Bloom filter proves absence by MEMBERSHIP: `key = x` (or a small
  * `IN` list) skips every batch whose filter returns "definitely not
  * present" — at 100 TB, the difference between scanning the table for
  * one id and opening the 1–2 batches that can contain it (the role of
  * Delta/Iceberg's optional bloom column indexes and parquet's own
  * bloom pages, lifted to the batch-dir level where whole directories
  * skip before any footer is read).
  *
  * Soundness mirrors the zone-map contract: a Bloom filter has false
  * POSITIVES only — "might contain" keeps the batch (maybe scanning it
  * for nothing, at the configured fpp), "definitely absent" is exact, so
  * a skip can never lose a row. Everything uncertain keeps the batch:
  * only equality/IN conjuncts consult filters, only within the column's
  * exact type family (integral↔integral — one putLong domain across
  * widths — and string↔string; floating/decimal literals never consult,
  * Spark's promotion semantics don't hold under hashing), null literals
  * never consult (`x = NULL` matches nothing and prunes upstream), and
  * a batch without a filter for the column is kept.
  *
  * Storage is one `_BLOOM` file per batch dir, framed as
  * `[count, (nameUTF, familyUTF, sketch)*]` — the sketch bytes are the
  * Spark `BloomFilter` wire format, self-delimiting, so sequential
  * `readFrom` round-trips. Written BEFORE the commit marker (a marker
  * implies complete sidecars), idempotently overwritten on replay.
  */
private[graft] object BatchBloom {

  val FileName = "_BLOOM"

  /** Columns eligible for a Bloom sidecar: one hashing domain per
    * family — every integral width goes through putLong, strings
    * through putString. (Doubles/decimals/timestamps are excluded: the
    * comparison semantics a predicate needs don't survive hashing.)
    */
  private def familyOf(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(BatchStats.Family.Integral)
    case StringType => Some(BatchStats.Family.Str)
    case _ => None
  }

  /** Build filters for `cols` over `df` (the landed batch read-back).
    * `expected` sizes the filters (the batch's row count — an
    * overestimate only lowers fpp). Ineligible / missing columns are
    * silently dropped, like [[BatchStats]]'s.
    */
  def compute(df: DataFrame, cols: Seq[String], expected: Long,
      fpp: Double = 0.01): Map[String, (String, BloomFilter)] = {
    if (expected <= 0) return Map.empty
    val fields = cols.flatMap(c => df.schema.fields.find(_.name.equalsIgnoreCase(c)))
      .filter(f => familyOf(f.dataType).isDefined)
    fields.map { f =>
      f.name -> (familyOf(f.dataType).get,
        df.stat.bloomFilter(f.name, expected, fpp))
    }.toMap
  }

  /** Idempotently write the batch dir's `_BLOOM` sidecar. Each sketch is
    * LENGTH-PREFIXED raw bytes: `BloomFilter.readFrom(stream)` buffers
    * past its own payload (measured: reading sketch 1 of 2 drains the
    * stream), so sequential readFrom calls on one stream lose every
    * entry after the first — the frame isolates each sketch instead.
    */
  def write(fs: FileSystem, batchDir: Path,
      blooms: Map[String, (String, BloomFilter)]): Unit = {
    if (blooms.isEmpty) return
    val out = new DataOutputStream(graft.runtime.MetaIO.create(fs, new Path(batchDir, FileName)))
    try {
      out.writeInt(blooms.size)
      blooms.toSeq.sortBy(_._1).foreach { case (name, (family, bf)) =>
        out.writeUTF(name)
        out.writeUTF(family)
        val buf = new java.io.ByteArrayOutputStream()
        bf.writeTo(buf)
        val bytes = buf.toByteArray
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    } finally out.close()
  }

  /** The batch dir's filters; empty when the sidecar is absent.
    * `wanted` restricts deserialization to the named columns
    * (case-insensitive) — the length prefix lets unneeded sketches be
    * SKIPPED, not read: a query probing one key column across thousands
    * of batch sidecars reads one sketch per batch, not every sketch.
    * None loads all. A torn/truncated sidecar reads as EMPTY — the
    * conservative "no pruning from this batch" the contract promises,
    * never a hang or a crash.
    */
  def read(fs: FileSystem, batchDir: Path,
      wanted: Option[Set[String]] = None): Map[String, (String, BloomFilter)] = {
    val p = new Path(batchDir, FileName)
    try {
      val in = new DataInputStream(graft.runtime.MetaIO.open(fs, p))
      try {
        val n = in.readInt()
        (0 until n).flatMap { _ =>
          val name = in.readUTF()
          val family = in.readUTF()
          val len = in.readInt()
          if (wanted.forall(_.exists(_.equalsIgnoreCase(name)))) {
            val bytes = new Array[Byte](len)
            in.readFully(bytes)
            Some(name -> (family,
              BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))))
          } else {
            skipExactly(in, len.toLong)
            None
          }
        }.toMap
      } finally in.close()
    } catch {
      case _: java.io.FileNotFoundException => Map.empty
      // truncated/corrupt sidecar (EOF, checksum, short read): a pruning
      // HINT degrades to "no pruning from this batch", never a failure —
      // the data read itself still fails loudly on a broken filesystem
      case _: java.io.IOException => Map.empty
    }
  }

  /** The sidecar's column names WITHOUT deserializing any sketch —
    * compaction only needs the names to decide what to recompute, and
    * a sketch can be megabytes.
    */
  def readNames(fs: FileSystem, batchDir: Path): Set[String] = {
    val p = new Path(batchDir, FileName)
    try {
      val in = new DataInputStream(graft.runtime.MetaIO.open(fs, p))
      try {
        val n = in.readInt()
        (0 until n).map { _ =>
          val name = in.readUTF()
          in.readUTF() // family
          skipExactly(in, in.readInt().toLong)
          name
        }.toSet
      } finally in.close()
    } catch {
      case _: java.io.FileNotFoundException => Set.empty
      case _: java.io.IOException => Set.empty // torn sidecar: recompute nothing
    }
  }

  /** skip() may return 0 at EOF instead of throwing — a truncated frame
    * must surface as EOF (handled conservatively above), not a busy loop.
    */
  private def skipExactly(in: DataInputStream, n: Long): Unit = {
    var toSkip = n
    while (toSkip > 0) {
      val skipped = in.skip(toSkip)
      if (skipped <= 0) throw new java.io.EOFException(
        s"truncated _BLOOM frame: $toSkip bytes missing")
      toSkip -= skipped
    }
  }

  /** True iff the filters PROVE the batch holds no row satisfying the
    * compiled predicate tree — i.e. some AND-conjunct is an equality/IN
    * whose every candidate value is definitely absent. The [[BatchStats]]
    * node walk with membership in place of ranges.
    */
  def mustBeEmpty(blooms: Map[String, (String, BloomFilter)],
      node: BatchStats.Node): Boolean =
    BatchStats.evalWith(node) { (col, litFam, lit) =>
      blooms.collectFirst {
        case (k, (fam, bf)) if k.equalsIgnoreCase(col) && fam == litFam =>
          !mightContain(bf, fam, lit)
      }.getOrElse(false)
    }

  private def mightContain(bf: BloomFilter, family: String,
      lit: BatchStats.Bound): Boolean = lit match {
    case BatchStats.NumB(v) if family == BatchStats.Family.Integral && v.isValidLong =>
      bf.mightContainLong(v.toLongExact)
    case BatchStats.BytesB(b) if family == BatchStats.Family.Str =>
      bf.mightContainString(new String(b, java.nio.charset.StandardCharsets.UTF_8))
    case _ => true // un-hashable literal: assume present (conservative)
  }
}
