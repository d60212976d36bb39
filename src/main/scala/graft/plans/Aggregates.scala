package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftbridge.Bridge

/** Custom aggregates — the two tiers SURVEY.md §4 names.
  *
  * [[ArgMax]] is a user-facing typed `Aggregator[IN, BUF, OUT]` (the
  * Dataset API tier); [[MinHashAgg]] is a Catalyst
  * `TypedImperativeAggregate` (the engine tier) computing all K
  * min-hash signature slots in ONE pass over the shingle stream with a
  * k-long mutable buffer — replacing K separate min() aggregates that
  * each re-scan the hash column. Both are deterministic and
  * oracle-reproducible.
  */

/** Typed argmax: the (sortKey, payload) pair with the largest sortKey,
  * ties broken by the smaller payload — used as
  * "the event id carrying each user's maximum value". */
class ArgMax extends Aggregator[(Double, Long), (Double, Long), Long] {
  override def zero: (Double, Long) = (Double.NegativeInfinity, Long.MaxValue)
  override def reduce(b: (Double, Long), a: (Double, Long)): (Double, Long) =
    merge(b, a)
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    if (x._1 > y._1 || (x._1 == y._1 && x._2 <= y._2)) x else y
  override def finish(r: (Double, Long)): Long = r._2
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** One-pass K-slot min-hash signature over a long hash column:
  * slot i holds min((h * (2i+3) + (97i+31)) mod P) — the same affine
  * family as Dedup's column formulation, in a single buffer. */
case class MinHashAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  private val P = PolyHash.P

  override def inputTypes: Seq[DataType] =
    Seq(LongType)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val m = (h * (2 * i + 3) + (97 * i + 31)) % P
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashAgg = copy(child = c.head)
  override def prettyName: String = "graft_minhash"
}

object MinHashAgg {
  /** Column form: minhash(hashCol, k) -> array<long> of k slots. */
  def minhash(hashCol: Column, k: Int): Column =
    Bridge.toColumn(
      MinHashAgg(Bridge.toExpr(hashCol), k).toAggregateExpression())
}

/** KMV (k-minimum-values) sketch buffer: the k smallest DISTINCT
  * hash values seen (Bar-Yossef et al. 2002; the Theta Sketch
  * Framework's QuickSelect sketch). The buffer is a capped ordered
  * set — update inserts only when the hash beats the current k-th
  * smallest, merge is set-union-then-recap: associative and
  * commutative, so partial sketches built map-side combine into the
  * exact same k values any evaluation order produces. This is the
  * shape that replaces a distinct-shuffle of EVERY hash with partial
  * buffers of ≤ k longs per partition ([[graft.functions.Sketches]]).
  * Eval emits the ascending array (deterministic — the DuckDB oracle
  * replays it with a plain window). */
case class KmvAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.TreeSet[Long]]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): scala.collection.mutable.TreeSet[Long] =
    scala.collection.mutable.TreeSet.empty[Long]

  private def insert(buf: scala.collection.mutable.TreeSet[Long], h: Long): Unit =
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf += h; buf -= buf.last }

  override def update(buf: scala.collection.mutable.TreeSet[Long],
      input: InternalRow): scala.collection.mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: scala.collection.mutable.TreeSet[Long],
      b2: scala.collection.mutable.TreeSet[Long]): scala.collection.mutable.TreeSet[Long] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: scala.collection.mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: scala.collection.mutable.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = scala.collection.mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvAgg = copy(child = c.head)
  override def prettyName: String = "graft_kmv"
}

object KmvAgg {
  /** Column form: kmv(hashCol, k) -> ascending array of the k
    * smallest distinct hashes (shorter when the set is smaller). */
  def kmv(hashCol: Column, k: Int): Column =
    Bridge.toColumn(
      KmvAgg(Bridge.toExpr(hashCol), k).toAggregateExpression())
}

/** Mergeable bottom-k-by-hash SAMPLE carrying a payload value: the
  * buffer keeps the k lexicographically smallest distinct (hash,
  * value) pairs, so eval returns a deterministic uniform sample of
  * the group's values — the mergeable-summaries sampling primitive
  * (Agarwal et al., PODS 2012 §3) that [[KmvAgg]] is the
  * cardinality-only cousin of. Below k distinct pairs the sample IS
  * the group (exact mode, like the theta sketch). Map-side partials
  * carry <= k pairs per (partition, group); merge is insert-fold —
  * associative and commutative, so any combine tree yields the same
  * sample and a DuckDB `DISTINCT -> ROW_NUMBER() OVER (ORDER BY h,
  * v) <= k` replays it exactly. */
case class KmvPairAgg(hash: Expression, value: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.TreeSet[(Long, Long)]]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def createAggregationBuffer()
      : scala.collection.mutable.TreeSet[(Long, Long)] =
    scala.collection.mutable.TreeSet.empty[(Long, Long)]

  private def insert(buf: scala.collection.mutable.TreeSet[(Long, Long)],
      p: (Long, Long)): Unit =
    if (buf.size < k) buf += p
    else if (implicitly[Ordering[(Long, Long)]].lt(p, buf.last) &&
        !buf.contains(p)) { buf += p; buf -= buf.last }

  override def update(buf: scala.collection.mutable.TreeSet[(Long, Long)],
      input: InternalRow): scala.collection.mutable.TreeSet[(Long, Long)] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      insert(buf, (h.asInstanceOf[Long], v.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: scala.collection.mutable.TreeSet[(Long, Long)],
      b2: scala.collection.mutable.TreeSet[(Long, Long)])
      : scala.collection.mutable.TreeSet[(Long, Long)] = {
    b2.foreach(insert(b1, _))
    b1
  }

  /** Values in (hash, value) order — the sample; re-sort by value for
    * rank statistics. */
  override def eval(buf: scala.collection.mutable.TreeSet[(Long, Long)]): Any =
    new GenericArrayData(buf.toArray.map(_._2))

  override def serialize(
      buf: scala.collection.mutable.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (h, v) => bb.putLong(h); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): scala.collection.mutable.TreeSet[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = scala.collection.mutable.TreeSet.empty[(Long, Long)]
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hash, value)
  override def withNewMutableAggBufferOffset(o: Int): KmvPairAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvPairAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvPairAgg =
    copy(hash = c.head, value = c(1))
  override def prettyName: String = "graft_kmv_sample"
}

object KmvPairAgg {
  /** Column form: kmvSample(hashCol, valueCol, k) -> values of the k
    * lexicographically smallest distinct (hash, value) pairs. */
  def kmvSample(hashCol: Column, valueCol: Column, k: Int): Column =
    Bridge.toColumn(
      KmvPairAgg(Bridge.toExpr(hashCol), Bridge.toExpr(valueCol), k)
        .toAggregateExpression())
}

/** One-pass 64-bit SimHash signature: per input (tokenHash, count),
  * bit j of the token is the LSB of the affine rehash
  * (h*(2j+3) + (97j+31)) mod P (same family as [[MinHashAgg]]); the
  * buffer accumulates the 64 count-weighted sums, and eval emits the
  * signature as 4 x 16-bit band values (sum of 1<<(j-16b) where
  * s_j >= 0) — the layout Dedup's banded search joins on. Replaces a
  * 64-SUM-column aggregate whose generated code dominated the query's
  * wall time at corpus scale. Values are identical to the column
  * formulation (pure integer arithmetic), so the DuckDB oracle is
  * unchanged. */
case class SimHash64Agg(hash: Expression, cnt: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  private val P = PolyHash.P

  // analysis-time type check (+ implicit int->long cast): without it a
  // non-BIGINT column would ClassCastException mid-task instead
  override def inputTypes: Seq[DataType] =
    Seq(LongType, LongType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = hash.eval(input)
    val cv = cnt.eval(input)
    if (hv != null && cv != null) {
      val h = hv.asInstanceOf[Long]
      val c = cv.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        val bit = ((h * (2 * j + 3) + (97 * j + 31)) % P) & 1L
        buf(j) += (if (bit == 1L) c else -c)
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val bands = new Array[Long](4)
    var j = 0
    while (j < 64) {
      if (buf(j) >= 0) bands(j / 16) |= (1L << (j % 16))
      j += 1
    }
    new GenericArrayData(bands)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * 64)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hash, cnt)
  override def withNewMutableAggBufferOffset(o: Int): SimHash64Agg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHash64Agg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SimHash64Agg =
    copy(hash = c(0), cnt = c(1))
  override def prettyName: String = "graft_simhash64"
}

object SimHash64Agg {
  /** Column form: simhash64(hashCol, cntCol) -> array<long> of the
    * 4 x 16-bit band values. */
  def simhash64(hashCol: Column, cntCol: Column): Column =
    Bridge.toColumn(
      SimHash64Agg(Bridge.toExpr(hashCol), Bridge.toExpr(cntCol))
        .toAggregateExpression())
}

/** One-pass Misra-Gries heavy-hitter sketch: at most `k` (token,
  * counter) slots; a stream item either increments its slot, claims a
  * free slot, or decrements every slot (dropping zeros). Merging two
  * sketches (Agarwal et al., "Mergeable Summaries", PODS 2012) sums
  * slot counters and, when more than `k` survive, subtracts the
  * (k+1)-th largest counter from all and drops the non-positive.
  *
  * Guarantee carried through update AND merge: a key's counter
  * under-counts its true frequency by at most N/(k+1), so every key
  * with true count > N/(k+1) — in particular every key with
  * count*k > N — still holds a slot in the final sketch. The
  * CANDIDATE SET beyond those survivors is arrival-order dependent
  * (not deterministic under Spark's partition-race merges), so the
  * sketch is only ever a first pass: [[graft.functions.Text.heavyHittersOn]]
  * re-counts candidates exactly and filters, making the end-to-end
  * result deterministic and oracle-checkable.
  *
  * Scale: the shuffle carries one k-slot map per partial aggregate
  * instead of the full vocabulary — the reason this beats a vocab-wide
  * groupBy at 100 TB, where a web-scale token vocabulary (10^9+ keys,
  * power-law mass) makes the exact first pass the bottleneck.
  * Output: struct(cands: sorted candidate keys, total: stream size).
  */
case class MisraGriesAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Buf]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  import MisraGriesAgg.Buf

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): Buf =
    new Buf(scala.collection.mutable.HashMap.empty, 0L)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      val key = v.toString
      buf.counts.get(key) match {
        case Some(c) => buf.counts.update(key, c + 1)
        case None if buf.counts.size < k => buf.counts.update(key, 1L)
        case None =>
          buf.counts.mapValuesInPlace((_, c) => c - 1)
          buf.counts.filterInPlace((_, c) => c > 0)
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.counts.foreach { case (key, c) =>
      b1.counts.update(key, b1.counts.getOrElse(key, 0L) + c)
    }
    b1.n += b2.n
    if (b1.counts.size > k) {
      val cut = b1.counts.values.toArray.sortInPlace()
        .apply(b1.counts.size - k - 1)
      b1.counts.mapValuesInPlace((_, c) => c - cut)
      b1.counts.filterInPlace((_, c) => c > 0)
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    val cands = buf.counts.keysIterator.toArray.sortInPlace()
      .map(org.apache.spark.unsafe.types.UTF8String.fromString(_): AnyRef)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(cands), buf.n))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (key, c) =>
      val kb = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readLong()
    val size = in.readInt()
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < size) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      m.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    new Buf(m, n)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cands", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("total", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesAgg = copy(child = c.head)
  override def prettyName: String = "graft_misra_gries"
}

object MisraGriesAgg {
  /** Mutable sketch state: key -> counter plus the stream size. */
  final class Buf(val counts: scala.collection.mutable.HashMap[String, Long],
      var n: Long)

  /** Column form: sketch(tokenCol, k) ->
    * struct(cands: array<string>, total: bigint). */
  def sketch(tokenCol: Column, k: Int): Column =
    Bridge.toColumn(
      MisraGriesAgg(Bridge.toExpr(tokenCol), k).toAggregateExpression())
}
