package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PG inet/cidr surface (reference: src/backend/utils/adt/network.c —
  * host, masklen, network, broadcast, `<<` containment). IPv4 as dotted
  * text; the numeric form is a plain LONG, so every operator lowers to
  * codegen'd integer arithmetic — no inet storage type needed (SURVEY
  * §2.10 listed network.c as a skip; this covers the everyday subset).
  * Containment uses subtraction/pmod instead of variable shifts so the
  * whole expression stays in fixed built-in ops. */
object NetworkFunctions {

  /** 'a.b.c.d' → 32-bit value in a LONG (inet_aton). */
  def inetAton(ip: Column): Column = {
    val o = split(ip, "\\.")
    element_at(o, 1).cast("long") * 16777216L +
      element_at(o, 2).cast("long") * 65536L +
      element_at(o, 3).cast("long") * 256L +
      element_at(o, 4).cast("long")
  }

  /** LONG → 'a.b.c.d' (inet_ntoa). */
  def inetNtoa(n: Column): Column =
    concat_ws(".",
      (n / 16777216L).cast("long") % 256,
      (n / 65536L).cast("long") % 256,
      (n / 256L).cast("long") % 256,
      n % 256)

  /** `host(inet)` — the address without the netmask suffix. */
  def host(cidr: Column): Column = substring_index(cidr, "/", 1)

  /** `masklen(inet)` — bits in the netmask (32 when unspecified). */
  def maskLen(cidr: Column): Column =
    when(cidr.contains("/"),
      substring_index(cidr, "/", -1).cast("int")).otherwise(lit(32))

  /** 2^(32-m) as a LONG column (the host-part modulus of a /m net). */
  private def hostSpan(m: Column): Column =
    pow(lit(2.0), lit(32) - m).cast("long")

  /** `network(inet)` — address with host bits zeroed, '/m' suffix. */
  def network(cidr: Column): Column = {
    val m = maskLen(cidr)
    val n = inetAton(host(cidr))
    concat(inetNtoa(n - pmod(n, hostSpan(m))), lit("/"), m)
  }

  /** `broadcast(inet)` — address with host bits set. */
  def broadcastAddr(cidr: Column): Column = {
    val m = maskLen(cidr)
    val n = inetAton(host(cidr))
    concat(inetNtoa(n - pmod(n, hostSpan(m)) + hostSpan(m) - 1),
      lit("/"), m)
  }

  /** `ip << net` — strict subnet containment (network.c network_sub):
    * the ip's network-prefix bits equal the net's, under the net's mask. */
  def containedIn(ip: Column, net: Column): Column = {
    val span = hostSpan(maskLen(net))
    val a = inetAton(host(ip))
    val b = inetAton(host(net))
    (a - pmod(a, span)) === (b - pmod(b, span)) &&
      maskLen(ip) > maskLen(net)
  }
}
