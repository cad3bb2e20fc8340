package graft.trck

import java.io.ByteArrayOutputStream

/** msgpack result sink (reference: src/results_msgpack.c — S5 in the
  * operator inventory, enabled by `--output-format msgpack`).
  *
  * Shapes (replicating output_msgpack):
  *  - non-groupby / merged: one map
  *    `{ "$c": {type:"int", value:N},
  *       "#s": {type:"set", data:{head:[tailId...]}, lexicon:{tail:id}},
  *       "&m": {type:"multiset", data:{head:[tailId,count,...]}, lexicon:…} }`
  *    (HLLs are skipped — reference msgpack_add_hll is a no-op);
  *  - groupby: an array of `{result: <map as above>, vars: {%v: str,
  *    #v: [str…]}}` per foreach tuple.
  *
  * Set encoding details (reference output_set):
  *  - tuples iterate in byte order of their full encoding (Judy JSL);
  *  - `data` groups by the DECODED first item (head); values are lexicon
  *    ids of the encoded tail (everything after the first item), assigned
  *    first-seen; multisets append the count after each id;
  *  - `lexicon` maps tail → id, iterated in tail byte order; the packed
  *    key drops the tail's leading type byte and truncates at the first
  *    invalid UTF-8 byte (reference's documented "lazy" escape handling);
  *    an empty tail (1-tuples) packs as nil.
  */
object OutputMsgpack {

  /** Minimal msgpack writer — only the shapes the sink needs (the format is
    * public; smallest-width encodings like the C packer).
    */
  final class Packer(out: ByteArrayOutputStream) {
    private def w(b: Int): Unit = out.write(b & 0xff)

    def mapHeader(n: Int): Unit =
      if (n < 16) w(0x80 | n)
      else if (n < 65536) { w(0xde); w(n >> 8); w(n) }
      else { w(0xdf); w(n >> 24); w(n >> 16); w(n >> 8); w(n) }

    def arrayHeader(n: Int): Unit =
      if (n < 16) w(0x90 | n)
      else if (n < 65536) { w(0xdc); w(n >> 8); w(n) }
      else { w(0xdd); w(n >> 24); w(n >> 16); w(n >> 8); w(n) }

    def str(bytes: Array[Byte]): Unit = {
      val n = bytes.length
      if (n < 32) w(0xa0 | n)
      else if (n < 256) { w(0xd9); w(n) }
      else if (n < 65536) { w(0xda); w(n >> 8); w(n) }
      else { w(0xdb); w(n >> 24); w(n >> 16); w(n >> 8); w(n) }
      out.write(bytes, 0, n)
    }

    def str(s: String): Unit = str(s.getBytes("UTF-8"))

    def nil(): Unit = w(0xc0)

    /** smallest-width integer, unsigned family for non-negatives */
    def long(v: Long): Unit =
      if (v >= 0) {
        if (v < 128) w(v.toInt)
        else if (v < 256) { w(0xcc); w(v.toInt) }
        else if (v < 65536) { w(0xcd); w((v >> 8).toInt); w(v.toInt) }
        else if (v < (1L << 32)) { w(0xce); var i = 24; while (i >= 0) { w((v >> i).toInt); i -= 8 } }
        else { w(0xcf); var i = 56; while (i >= 0) { w((v >> i).toInt); i -= 8 } }
      } else {
        if (v >= -32) w(0xe0 | (v.toInt & 0x1f))
        else if (v >= Byte.MinValue) { w(0xd0); w(v.toInt) }
        else if (v >= Short.MinValue) { w(0xd1); w((v >> 8).toInt); w(v.toInt) }
        else if (v >= Int.MinValue) { w(0xd2); var i = 24; while (i >= 0) { w((v >> i).toInt); i -= 8 } }
        else { w(0xd3); var i = 56; while (i >= 0) { w((v >> i).toInt); i -= 8 } }
      }
  }

  /** Decoded first item of an encoded tuple + the encoded remainder
    * (reference: string_tuple_extract_head).
    */
  private[trck] def extractHead(enc: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val head = new ByteArrayOutputStream(32)
    var i = 1 // skip type byte
    while (i < enc.length && enc(i) != ',') {
      if ((enc(i) & 0xff) == 0xff) {
        i += 1
        (enc(i) & 0xff) match {
          case 0xff => head.write(0xff)
          case 0xfe => head.write(0)
          case 0xfd => head.write(',')
          case _    => ()
        }
        i += 1
      } else { head.write(enc(i)); i += 1 }
    }
    if (i < enc.length && enc(i) == ',') i += 1
    (head.toByteArray, java.util.Arrays.copyOfRange(enc, i, enc.length))
  }

  /** Length of the longest valid-UTF-8 prefix (reference: utf8_check —
    * NULL means fully valid).
    */
  private def utf8PrefixLen(b: Array[Byte]): Int = {
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      val n =
        if (c < 0x80) 1
        else if ((c & 0xe0) == 0xc0 && c >= 0xc2) 2
        else if ((c & 0xf0) == 0xe0) 3
        else if ((c & 0xf8) == 0xf0 && c <= 0xf4) 4
        else return i
      if (i + n > b.length) return i
      var j = 1
      while (j < n) {
        if ((b(i + j) & 0xc0) != 0x80) return i
        j += 1
      }
      i += n
    }
    b.length
  }

  private def packSet(pk: Packer, m: collection.SortedMap[Array[Byte], Long], multiset: Boolean): Unit = {
    // pass 1: heads + tail lexicon (first-seen ids, in tuple byte order)
    val entries = m.toVector.map { case (enc, cnt) =>
      val (head, tail) = extractHead(enc)
      (head, tail, cnt)
    }
    val lexicon = scala.collection.mutable.LinkedHashMap[Seq[Byte], Int]()
    def tailId(t: Array[Byte]): Int =
      lexicon.getOrElseUpdate(t.toSeq, lexicon.size + 1)

    // group consecutive equal heads (entries are tuple-byte-ordered, which
    // orders equal heads consecutively)
    val groups = scala.collection.mutable.ArrayBuffer[(Array[Byte], scala.collection.mutable.ArrayBuffer[Long])]()
    for ((head, tail, cnt) <- entries) {
      val id = tailId(tail).toLong
      if (groups.nonEmpty && java.util.Arrays.equals(groups.last._1, head)) {
        groups.last._2 += id
        if (multiset) groups.last._2 += cnt
      } else {
        val buf = scala.collection.mutable.ArrayBuffer(id)
        if (multiset) buf += cnt
        groups += ((head, buf))
      }
    }

    pk.str("data")
    pk.mapHeader(groups.length)
    for ((head, buf) <- groups) {
      pk.str(head)
      pk.arrayHeader(buf.length)
      buf.foreach(pk.long)
    }

    pk.str("lexicon")
    pk.mapHeader(lexicon.size)
    // iterate in tail byte order (Judy order of the lexicon keys)
    for ((tailSeq, id) <- lexicon.toVector.sortBy(_._1.toArray)(Tuple.byteOrdering)) {
      val tail = tailSeq.toArray
      if (tail.isEmpty) pk.nil()
      else {
        val len = utf8PrefixLen(tail)
        pk.str(java.util.Arrays.copyOfRange(tail, 1, math.max(1, len)))
      }
      pk.long(id.toLong)
    }
  }

  private def packResult(pk: Packer, r: Results): Unit = {
    pk.mapHeader(r.counters.size + r.sets.size + r.msets.size) // HLLs skipped
    r.counters.foreach { case (k, v) =>
      pk.str("$" + k)
      pk.mapHeader(2)
      pk.str("type"); pk.str("int")
      pk.str("value"); pk.long(v)
    }
    r.sets.foreach { case (k, m) =>
      pk.str("#" + k)
      pk.mapHeader(3)
      pk.str("type"); pk.str("set")
      packSet(pk, m, multiset = false)
    }
    r.msets.foreach { case (k, m) =>
      pk.str("&" + k)
      pk.mapHeader(3)
      pk.str("type"); pk.str("multiset")
      packSet(pk, m, multiset = true)
    }
  }

  def render(out: LocalRunner.RunOutput,
             maxRenderBytes: Long = OutputJson.DefaultMaxRenderBytes): Array[Byte] = {
    val bos = new ByteArrayOutputStream(1024)
    val pk = new Packer(bos)
    // same driver-side render budget as OutputJson (shared constant and
    // error contract), checked per tuple — results are small by reference
    // contract; a pathological set yield must fail clearly, not OOM
    def check(): Unit =
      if (bos.size() > maxRenderBytes)
        throw new IllegalStateException(
          s"msgpack result exceeds the ${maxRenderBytes}-byte render budget — results " +
            "are driver-rendered (reference semantics: small per-tuple tallies); " +
            "aggregate huge set yields through the relational engine instead")
    if (out.prog.groupbyVars.isEmpty || out.merged) {
      packResult(pk, out.results.head); check()
    } else {
      pk.arrayHeader(out.tuples.length)
      out.tuples.zip(out.results).foreach { case (t, r) =>
        pk.mapHeader(2)
        pk.str("result")
        packResult(pk, r)
        pk.str("vars")
        pk.mapHeader(out.prog.groupbyVars.length)
        out.prog.groupbyVars.zip(t.items).foreach {
          case (v, Left(s)) => pk.str(v); pk.str(s)
          case (v, Right(ss)) =>
            pk.str(v)
            pk.arrayHeader(ss.length)
            ss.foreach(pk.str(_: String))
        }
        check()
      }
    }
    bos.toByteArray
  }
}
