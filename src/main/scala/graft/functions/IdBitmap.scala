package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Compact customer-id bitmap with the roaring layout: ids are chunked by
  * their high bits (key = id >>> 16) into dense 64 Ki-bit blocks, so sparse
  * id spaces cost one 8 KiB block per populated 65 536-id range instead of a
  * bit per possible id. Mirrors the reference's segment bitmaps
  * (`src/attributes.cpp` index bitmaps; segment math
  * `src/queryinterpreter.cpp:624-888`) without an external dependency.
  *
  * Negative ids are rejected (the reference hashes textual ids to signed
  * 64-bit, but its bitmap index also only spans linear offsets).
  */
final class IdBitmap extends Serializable {

  private var keys: Array[Long] = Array.empty          // sorted chunk keys
  private var blocks: Array[Array[Long]] = Array.empty // 1024 longs each

  private def blockFor(key: Long, create: Boolean): Array[Long] = {
    val i = java.util.Arrays.binarySearch(keys, key)
    if (i >= 0) blocks(i)
    else if (!create) null
    else {
      val at = -i - 1
      val nk = new Array[Long](keys.length + 1)
      val nb = new Array[Array[Long]](blocks.length + 1)
      System.arraycopy(keys, 0, nk, 0, at)
      System.arraycopy(blocks, 0, nb, 0, at)
      nk(at) = key
      nb(at) = new Array[Long](1024)
      System.arraycopy(keys, at, nk, at + 1, keys.length - at)
      System.arraycopy(blocks, at, nb, at + 1, blocks.length - at)
      keys = nk; blocks = nb
      nb(at)
    }
  }

  def add(id: Long): this.type = {
    require(id >= 0, s"negative id $id")
    val low = (id & 0xFFFF).toInt
    blockFor(id >>> 16, create = true)(low >>> 6) |= (1L << (low & 63))
    this
  }

  def contains(id: Long): Boolean = {
    if (id < 0) return false
    val b = blockFor(id >>> 16, create = false)
    val low = (id & 0xFFFF).toInt
    b != null && (b(low >>> 6) & (1L << (low & 63))) != 0
  }

  def cardinality: Long = {
    var n = 0L
    var i = 0
    while (i < blocks.length) {
      val b = blocks(i)
      var j = 0
      while (j < 1024) { n += java.lang.Long.bitCount(b(j)); j += 1 }
      i += 1
    }
    n
  }

  private def zipWith(o: IdBitmap, keepLeftOnly: Boolean, keepRightOnly: Boolean,
                      op: (Long, Long) => Long): IdBitmap = {
    val out = new IdBitmap
    val ks = scala.collection.mutable.ArrayBuffer.empty[Long]
    val bs = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    var i = 0; var j = 0
    def emit(key: Long, block: Array[Long]): Unit =
      if (block.exists(_ != 0L)) { ks += key; bs += block }
    while (i < keys.length || j < o.keys.length) {
      if (j >= o.keys.length || (i < keys.length && keys(i) < o.keys(j))) {
        if (keepLeftOnly) emit(keys(i), blocks(i).map(op(_, 0L)))
        i += 1
      } else if (i >= keys.length || o.keys(j) < keys(i)) {
        if (keepRightOnly) emit(o.keys(j), o.blocks(j).map(op(0L, _)))
        j += 1
      } else {
        val merged = Array.tabulate(1024)(k => op(blocks(i)(k), o.blocks(j)(k)))
        emit(keys(i), merged)
        i += 1; j += 1
      }
    }
    out.keys = ks.toArray; out.blocks = bs.toArray
    out
  }

  def or(o: IdBitmap): IdBitmap = zipWith(o, keepLeftOnly = true, keepRightOnly = true, _ | _)
  def and(o: IdBitmap): IdBitmap = zipWith(o, keepLeftOnly = false, keepRightOnly = false, _ & _)
  def andNot(o: IdBitmap): IdBitmap = zipWith(o, keepLeftOnly = true, keepRightOnly = false, _ & ~_)

  /** In-place union (aggregation merge path — avoids allocation). */
  def orInPlace(o: IdBitmap): this.type = {
    var j = 0
    while (j < o.keys.length) {
      val mine = blockFor(o.keys(j), create = true)
      val theirs = o.blocks(j)
      var k = 0
      while (k < 1024) { mine(k) |= theirs(k); k += 1 }
      j += 1
    }
    this
  }

  def toSeq: Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < keys.length) {
      val base = keys(i) << 16
      val b = blocks(i)
      var j = 0
      while (j < 1024) {
        var bits = b(j)
        while (bits != 0) {
          val t = java.lang.Long.numberOfTrailingZeros(bits)
          out += base + (j.toLong << 6) + t
          bits &= bits - 1
        }
        j += 1
      }
      i += 1
    }
    out.toSeq
  }

  /** Byte image: [nChunks][key, 1024 longs]… via DataOutput. */
  def serialize(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(keys.length)
    var i = 0
    while (i < keys.length) {
      out.writeLong(keys(i))
      val b = blocks(i)
      var j = 0
      while (j < 1024) { out.writeLong(b(j)); j += 1 }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object IdBitmap {
  def deserialize(bytes: Array[Byte]): IdBitmap = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val bm = new IdBitmap
    bm.keys = new Array[Long](n)
    bm.blocks = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      bm.keys(i) = in.readLong()
      val b = new Array[Long](1024)
      var j = 0
      while (j < 1024) { b(j) = in.readLong(); j += 1 }
      bm.blocks(i) = b
      i += 1
    }
    bm
  }

  def of(ids: Iterable[Long]): IdBitmap = {
    val bm = new IdBitmap
    ids.foreach(bm.add)
    bm
  }

  /** Typed aggregation: a column of ids → one serialized bitmap. Partial
    * bitmaps build per partition and merge with in-place OR — the shuffle
    * carries one compact image per partition instead of the id rows. */
  val agg: TypedColumn[Long, Array[Byte]] =
    new Aggregator[Long, IdBitmap, Array[Byte]] {
      def zero: IdBitmap = new IdBitmap
      def reduce(b: IdBitmap, id: Long): IdBitmap = b.add(id)
      def merge(a: IdBitmap, b: IdBitmap): IdBitmap = a.orInPlace(b)
      def finish(b: IdBitmap): Array[Byte] = b.serialize()
      def bufferEncoder: Encoder[IdBitmap] = Encoders.kryo[IdBitmap]
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }.toColumn

  /** Untyped (Column) form of [[agg]] that SKIPS nulls, so several segment
    * bitmaps can build in ONE aggregation pass over a shared per-person
    * frame — `agg(colAgg(when(predA, id)), colAgg(when(predB, id)), …)` —
    * instead of one full scan + driver collect per segment (optimization
    * guide §2.3: aggregate before you shuffle; share the pass). */
  val colAgg: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new Aggregator[java.lang.Long, IdBitmap, Array[Byte]] {
        def zero: IdBitmap = new IdBitmap
        def reduce(b: IdBitmap, id: java.lang.Long): IdBitmap =
          if (id == null) b else b.add(id.longValue())
        def merge(a: IdBitmap, b: IdBitmap): IdBitmap = a.orInPlace(b)
        def finish(b: IdBitmap): Array[Byte] = b.serialize()
        def bufferEncoder: Encoder[IdBitmap] = Encoders.kryo[IdBitmap]
        def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      }, Encoders.LONG)
}
