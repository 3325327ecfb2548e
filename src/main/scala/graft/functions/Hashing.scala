package graft.functions

import java.security.MessageDigest

/** Content-addressing hashes.
  *
  * Body identity in the reference is a sha2-256 multihash rendered as hex:
  * code 0x12, length 0x20 prefix then the digest — i.e. "1220" + sha256hex
  * (/root/reference/vendor/github.com/datatogether/core/file.go:166-177,
  * core/metadata.go:17-27). Link identity is the multihash of the JSON object
  * {"src":...,"dst":...} in that field order (core/link.go:90-110, Go
  * encoding/json serializes struct fields in declaration order).
  */
object Hashing {

  val EmptyBodyHash: String =
    "1220e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"

  private def sha256hex(data: Array[Byte]): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(data)
    val sb = new StringBuilder(64)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** hex("1220" ++ sha256(body)) — file.go:166-177. */
  def multihash(body: Array[Byte]): String =
    "1220" + sha256hex(if (body == null) Array.emptyByteArray else body)

  /** Go encoding/json string escaping for the link-hash payload:
    * escapes `"` `\\` control chars, and (Go-specific) `<` `>` `&` as \u00XX. */
  private def goJsonString(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '<'  => sb.append("\\u003c")
      case '>'  => sb.append("\\u003e")
      case '&'  => sb.append("\\u0026")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c    => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  /** core/link.go:90-110 calcHash: multihash of {"src":src,"dst":dst}. */
  def linkHash(src: String, dst: String): String = {
    val json = s"""{"src":${goJsonString(src)},"dst":${goJsonString(dst)}}"""
    multihash(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Deterministic surrogate id for a url (replaces uuid.New(), SURVEY §7.4). */
  def urlId(url: String): String = {
    val h = sha256hex(url.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // shape it like a uuid for fidelity of form
    s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-${h.substring(16, 20)}-${h.substring(20, 32)}"
  }
}
