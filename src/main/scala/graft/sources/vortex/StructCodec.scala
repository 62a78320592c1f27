package graft.sources.vortex

import java.nio.{ByteBuffer, ByteOrder}
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData, ArrayBasedMapData}
import org.apache.spark.sql.types._

/** Shredded storage for TOP-LEVEL struct columns (format §struct-shred,
  * encoding id [[VortexFormat.EncStruct]]): instead of one serialized
  * blob per value (NestedCodec — still the layout for arrays, maps,
  * and structs nested below the top level), a struct column's page is
  * a struct-level null bitmap plus one INDEPENDENTLY ENCODED sub-page
  * per child, each produced by the ordinary [[PageCodec]] stack
  * (dict/RLE/FoR/FSST/zstd per child — a string child compresses like
  * a string column, not like bytes inside opaque blobs).
  *
  * Why: nested-field pruning. A query touching only `meta.mime` of a
  * multimodal metadata struct decodes exactly the mime sub-page —
  * sibling children are SKIPPED (length-prefixed, never decompressed,
  * never allocated). At 100 TB of media metadata that is the
  * difference between scanning one small string column and
  * materializing every struct field of every row.
  *
  * Page layout (little-endian):
  * {{{
  * [childCount: int32]
  * [structNullBitmap: ceil(rows/8) bytes]          // bit i = row i null
  * per child, in file-schema order:
  *   [encoding: byte][compressed: byte][nullCount: int32][len: int32][payload]
  * }}}
  *
  * Old files (blob-encoded struct pages) stay readable: decode
  * branches on the page's encoding id, and pruned reads of blob pages
  * project after deserializing ([[NestedProject]]).
  */
object StructCodec {

  /** probes for specs/plan audits: sub-pages decoded vs skipped */
  val childDecodes = new AtomicLong(0L)
  val childSkips = new AtomicLong(0L)

  /** Encode one struct column chunk from its shredded sub-buffer. */
  def encode(n: Int, structNulls: Array[Boolean], sub: ChunkBuffer,
             st: StructType): PageCodec.Encoded = {
    val k = st.fields.length
    val parts = new Array[(PageCodec.Encoded)](k)
    var j = 0
    var total = 4 + ((n + 7) >> 3)
    while (j < k) {
      val vec =
        if (sub.fixed(j)) new ColVec(n, sub.nulls(j), sub.longs(j), null)
        else new ColVec(n, sub.nulls(j), null, sub.bins(j))
      val e = PageCodec.encode(vec, st.fields(j).dataType)
      parts(j) = e
      total += 10 + e.bytes.length
      j += 1
    }
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(k)
    val bitmap = new Array[Byte]((n + 7) >> 3)
    var i = 0
    var structNullCount = 0
    while (i < n) {
      if (structNulls(i)) { bitmap(i >> 3) = (bitmap(i >> 3) | (1 << (i & 7))).toByte
                            structNullCount += 1 }
      i += 1
    }
    bb.put(bitmap)
    j = 0
    while (j < k) {
      val e = parts(j)
      bb.put(e.encoding).put(if (e.compressed) 1.toByte else 0.toByte)
      bb.putInt(e.nullCount).putInt(e.bytes.length)
      bb.put(e.bytes)
      j += 1
    }
    PageCodec.Encoded(VortexFormat.EncStruct, compressed = false, bb.array(),
      structNullCount, None, None)
  }

  /** Decode a struct page, materializing ONLY the children of
    * `wanted` (a by-name subset of `stored`'s children); the others
    * are skipped without decompression or allocation. Returns a
    * [[ColVec]] whose `kids` are aligned with `wanted`'s fields. */
  def decode(bytes: Array[Byte], rows: Int, stored: StructType,
             wanted: StructType): ColVec = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val k = bb.getInt()
    require(k == stored.fields.length,
      s"vortex struct page: $k children on disk, schema has ${stored.fields.length}")
    val bitmap = new Array[Byte]((rows + 7) >> 3)
    bb.get(bitmap)
    val nulls = new Array[Boolean](rows)
    var i = 0
    while (i < rows) { nulls(i) = (bitmap(i >> 3) & (1 << (i & 7))) != 0; i += 1 }
    val slot: Array[Int] = stored.fields.map(f => wanted.fieldNames.indexOf(f.name))
    val kids = new Array[ColVec](wanted.fields.length)
    val kidFields = new Array[StructField](wanted.fields.length)
    var j = 0
    while (j < k) {
      val enc = bb.get()
      val comp = bb.get() != 0
      val nullCount = bb.getInt()
      val len = bb.getInt()
      if (slot(j) >= 0) {
        val payload = new Array[Byte](len)
        bb.get(payload)
        val f = stored.fields(j)
        val vec = PageCodec.decode(payload, enc, comp, rows, nullCount, f.dataType)
        if (NestedCodec.isNested(f.dataType)) vec.blobType = f.dataType
        kids(slot(j)) = vec
        kidFields(slot(j)) = f
        childDecodes.incrementAndGet()
      } else {
        bb.position(bb.position() + len)
        childSkips.incrementAndGet()
      }
      j += 1
    }
    val out = new ColVec(rows, nulls, null, null)
    out.kids = kids
    out.kidFields = kidFields
    out
  }
}

/** Project a Catalyst value from its STORED nested type onto a PRUNED
  * view of it (struct children dropped by name, recursively through
  * arrays/maps/structs) — the read path for blob-encoded nested pages
  * under nested-schema pruning, and for sub-struct pruning below a
  * shredded child. */
object NestedProject {

  def project(v: Any, from: DataType, to: DataType): Any = {
    if (v == null || from == to) return v
    (from, to) match {
      case (fs: StructType, ts: StructType) =>
        val r = v.asInstanceOf[InternalRow]
        val out = new GenericInternalRow(ts.fields.length)
        var j = 0
        while (j < ts.fields.length) {
          val tf = ts.fields(j)
          val fi = fs.fieldIndex(tf.name)
          val fv = if (r.isNullAt(fi)) null else r.get(fi, fs.fields(fi).dataType)
          out.update(j, project(fv, fs.fields(fi).dataType, tf.dataType))
          j += 1
        }
        out
      case (ArrayType(fe, _), ArrayType(te, _)) =>
        val a = v.asInstanceOf[ArrayData]
        val n = a.numElements()
        val out = new Array[Any](n)
        var i = 0
        while (i < n) {
          out(i) = if (a.isNullAt(i)) null else project(a.get(i, fe), fe, te)
          i += 1
        }
        new GenericArrayData(out)
      case (MapType(fk, fv, _), MapType(tk, tv, _)) =>
        val m = v.asInstanceOf[MapData]
        new ArrayBasedMapData(
          project(m.keyArray(), ArrayType(fk), ArrayType(tk)).asInstanceOf[ArrayData],
          project(m.valueArray(), ArrayType(fv, true), ArrayType(tv, true)).asInstanceOf[ArrayData])
      case _ => v
    }
  }
}
