package graft.sources

/** Dotted-quad ↔ 32-bit int IPv4 helpers shared by the three codecs (one
  * copy, so any hardening lands everywhere at once). */
private[sources] object Ip {

  def toInt(ip: String): Int = {
    val p = ip.split('.')
    require(p.length == 4, s"not a dotted-quad IPv4 address: $ip")
    ((p(0).toInt & 0xff) << 24) | ((p(1).toInt & 0xff) << 16) |
      ((p(2).toInt & 0xff) << 8) | (p(3).toInt & 0xff)
  }

  def toStr(v: Int): String =
    s"${(v >>> 24) & 0xff}.${(v >>> 16) & 0xff}.${(v >>> 8) & 0xff}.${v & 0xff}"
}
