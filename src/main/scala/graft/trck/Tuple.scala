package graft.trck

/** Byte-exact string-tuple encoding (reference: src/utils.c:59-166).
  *
  * A tuple is items joined by ',', each item = 1 type byte ('S' string /
  * 'B' bytes) followed by the payload with escapes:
  * `,` → FF FD, NUL → FF FE, FF → FF FF. This encoded byte string is
  * what set/multiset keys sort by (Judy JSL byte order) and what the HLL
  * hashes, so it must match exactly for output parity.
  */
object Tuple {
  final val TypeString: Byte = 'S'
  final val TypeBytes: Byte = 'B'

  /** values(i) carries raw item bytes as an ISO-8859-1 string (so cookie
    * bytes survive); types(i) is 'S' or 'B'.
    */
  def encode(values: Array[String], types: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    var i = 0
    while (i < values.length) {
      if (i > 0) out.write(',')
      out.write(types(i))
      val bytes = values(i).getBytes("ISO-8859-1")
      var j = 0
      while (j < bytes.length) {
        bytes(j) match {
          case ','                    => out.write(0xff); out.write(0xfd)
          case 0                      => out.write(0xff); out.write(0xfe)
          case b if (b & 0xff) == 255 => out.write(0xff); out.write(0xff)
          case b                      => out.write(b)
        }
        j += 1
      }
      i += 1
    }
    out.toByteArray
  }

  /** Render an encoded tuple for output: items comma-joined; string items
    * verbatim, bytes items hex (reference: src/results_json.c:105-135
    * string_tuple_to_json).
    */
  def render(encoded: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    var first = true
    while (i < encoded.length) {
      if (!first) sb.append(',')
      first = false
      val typ = encoded(i)
      i += 1
      val item = new java.io.ByteArrayOutputStream(32)
      var done = false
      while (!done && i < encoded.length) {
        val b = encoded(i) & 0xff
        if (b == ',') { done = true }
        else if (b == 0xff) {
          i += 1
          (encoded(i) & 0xff) match {
            case 0xff => item.write(0xff)
            case 0xfe => item.write(0)
            case 0xfd => item.write(',')
            case _    => ()
          }
          i += 1
        } else { item.write(b); i += 1 }
      }
      if (done) i += 1 // skip separator
      val bytes = item.toByteArray
      if (typ == TypeBytes) bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
      else sb.append(new String(bytes, "ISO-8859-1"))
    }
    sb.toString
  }

  /** Unsigned lexicographic byte order — Judy JSL iteration order. */
  val byteOrdering: Ordering[Array[Byte]] = (a: Array[Byte], b: Array[Byte]) => {
    val n = math.min(a.length, b.length)
    var i = 0
    var r = 0
    while (r == 0 && i < n) { r = (a(i) & 0xff) - (b(i) & 0xff); i += 1 }
    if (r != 0) r else a.length - b.length
  }
}
