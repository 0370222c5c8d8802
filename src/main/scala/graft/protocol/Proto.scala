package graft.protocol

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Minimal protobuf wire-format codec (varint + length-delimited fields) —
  * just enough to keep our tickets and handles byte-compatible with the
  * reference's prost-generated messages
  * (datafusion-flight-sql-server/src/state.rs:45-49, 113-120) without a
  * protobuf runtime (none is available offline).
  *
  * Wire types used: 0 = varint, 2 = length-delimited (string/bytes/message).
  */
object Proto {

  final class Writer {
    private val out = new ByteArrayOutputStream()

    def writeVarint(v: Long): this.type = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        out.write(((x & 0x7f) | 0x80).toInt)
        x >>>= 7
      }
      out.write(x.toInt)
      this
    }

    private def key(tag: Int, wireType: Int): this.type =
      writeVarint(((tag.toLong << 3) | wireType))

    def bytesField(tag: Int, value: Array[Byte]): this.type = {
      key(tag, 2)
      writeVarint(value.length)
      out.write(value, 0, value.length)
      this
    }

    def stringField(tag: Int, value: String): this.type =
      bytesField(tag, value.getBytes(StandardCharsets.UTF_8))

    def varintField(tag: Int, value: Long): this.type = {
      key(tag, 0)
      writeVarint(value)
    }

    /** Proto3 default-value elision for scalar fields. */
    def stringFieldNonEmpty(tag: Int, value: String): this.type =
      if (value.isEmpty) this else stringField(tag, value)

    def boolField(tag: Int, value: Boolean): this.type =
      if (value) varintField(tag, 1) else this

    def result(): Array[Byte] = out.toByteArray
  }

  final case class Field(tag: Int, wireType: Int, varint: Long, bytes: Array[Byte])

  /** Decode a message into its top-level fields (repeated tags preserved in
    * order). Unknown wire types raise — our messages only use 0 and 2.
    */
  def decodeFields(msg: Array[Byte]): Seq[Field] = {
    val fields = Seq.newBuilder[Field]
    var i = 0
    def varint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        if (i >= msg.length) throw new IllegalArgumentException("truncated varint")
        val b = msg(i) & 0xff
        i += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    while (i < msg.length) {
      val k = varint()
      val tag = (k >>> 3).toInt
      val wt = (k & 7).toInt
      wt match {
        case 0 => fields += Field(tag, 0, varint(), Array.emptyByteArray)
        case 2 =>
          val len = varint().toInt
          if (i + len > msg.length) throw new IllegalArgumentException("truncated bytes field")
          fields += Field(tag, 2, 0L, java.util.Arrays.copyOfRange(msg, i, i + len))
          i += len
        case other =>
          throw new IllegalArgumentException(s"unsupported wire type $other for tag $tag")
      }
    }
    fields.result()
  }

  def string(f: Field): String = new String(f.bytes, StandardCharsets.UTF_8)
}
