package graft.osl

/** OSL runtime variant — the engine's equivalent of the reference's `cvar`
  * (`lib/var/var.h`): bool/int/double/string plus list/dict/set containers
  * with implicit numeric conversions and loose equality.
  *
  * Used only inside the Tier-B per-customer interpreter; never crosses an
  * executor boundary unserialised.
  */
sealed trait Value extends Serializable {
  def truthy: Boolean = this match {
    case VNone          => false
    case VBool(b)       => b
    case VInt(i)        => i != 0
    case VDbl(d)        => d != 0.0
    case VStr(s)        => s.nonEmpty
    case VList(xs)      => xs.nonEmpty
    case VSet(xs)       => xs.nonEmpty
    case VDict(m)       => m.nonEmpty
  }
  def asDouble: Double = this match {
    case VInt(i)  => i.toDouble
    case VDbl(d)  => d
    case VBool(b) => if (b) 1.0 else 0.0
    case VStr(s)  => try s.toDouble catch { case _: Throwable => 0.0 }
    case _        => 0.0
  }
  def asLong: Long = this match {
    case VInt(i)  => i
    case VDbl(d)  => d.toLong
    case VBool(b) => if (b) 1L else 0L
    case VStr(s)  => try s.trim.toDouble.toLong catch { case _: Throwable => 0L }
    case _        => 0L
  }
  def asStr: String = this match {
    case VStr(s)  => s
    case VInt(i)  => i.toString
    case VDbl(d)  => if (d == d.floor && !d.isInfinite) f"$d%.1f" else d.toString
    case VBool(b) => if (b) "true" else "false"
    case VNone    => ""
    case VList(xs) => xs.map(_.asStr).mkString("[", ",", "]")
    case VSet(xs)  => xs.toSeq.map(_.asStr).sorted.mkString("{", ",", "}")
    case VDict(m)  => m.map { case (k, v) => s"$k:${v.asStr}" }.mkString("{", ",", "}")
  }
  def isNumeric: Boolean = this match {
    case VInt(_) | VDbl(_) | VBool(_) => true
    case _ => false
  }
}

case object VNone extends Value
final case class VBool(b: Boolean) extends Value
final case class VInt(i: Long) extends Value
final case class VDbl(d: Double) extends Value
final case class VStr(s: String) extends Value
final case class VList(xs: Vector[Value]) extends Value
final case class VSet(xs: Set[Value]) extends Value
final case class VDict(m: Map[String, Value]) extends Value

object Value {
  def apply(a: Any): Value = a match {
    case null            => VNone
    case v: Value        => v
    case b: Boolean      => VBool(b)
    case i: Int          => VInt(i.toLong)
    case l: Long         => VInt(l)
    case f: Float        => VDbl(f.toDouble)
    case d: Double       => VDbl(d)
    case s: String       => VStr(s)
    // scala.collection.Seq, NOT the default (immutable) Seq: Spark rows
    // return mutable.ArraySeq for array columns, which is not an
    // immutable.Seq — an immutable-only match silently stringified every
    // set prop to VStr("ArraySeq(...)") (caught by the test_db.h port:
    // `for ref in referral_search` iterated characters)
    case xs: scala.collection.Seq[_] => VList(xs.map(apply).toVector)
    case xs: Array[_]    => VList(xs.map(apply).toVector)
    case other           => VStr(other.toString)
  }

  private def isFloating(v: Value): Boolean = v match {
    case VDbl(_) => true
    case _ => false
  }
  // Spark SQL comparison semantics for doubles: -0.0 is normalized to
  // 0.0 and NaN ranks ABOVE every value (and equals itself). Tier B
  // mirrors that ordering exactly so both tiers agree on any world —
  // NaN can never come out of the reference's own storage (doubles are
  // fixed-point ×10,000, src/grid.cpp:809), so the engine-wide ordering
  // is ours to pin, and Spark/DuckDB both use NaN-greatest.
  private def normD(d: Double): Double = if (d == 0.0) 0.0 else d

  /** Loose equality: numeric compare when both numeric (exact int64 for
    * int-int pairs, mirroring cvar lib/var/var.h:1173-1198 and Spark's
    * long `=`; Spark double semantics otherwise), else string compare
    * when one side is a string and the other scalar, else structural. */
  def eq(a: Value, b: Value): Boolean = (a, b) match {
    case (VNone, VNone) => true
    case (VNone, _) | (_, VNone) => false
    case (x, y) if x.isNumeric && y.isNumeric =>
      if (isFloating(x) || isFloating(y))
        java.lang.Double.compare(normD(x.asDouble), normD(y.asDouble)) == 0
      else x.asLong == y.asLong
    case (VStr(s), y) => s == y.asStr
    case (x, VStr(s)) => x.asStr == s
    case (x, y) => x == y
  }

  /** Ordering: int-int pairs compare as exact int64 (cvar
    * lib/var/var.h:1204-1208 — no round-trip through double, so longs
    * past 2^53 order correctly); any double operand compares in Spark's
    * double ordering (NaN greatest, -0.0 = 0.0); else string-wise. */
  def cmp(a: Value, b: Value): Int = (a, b) match {
    case (x, y) if x.isNumeric && y.isNumeric =>
      if (isFloating(x) || isFloating(y))
        java.lang.Double.compare(normD(x.asDouble), normD(y.asDouble))
      else java.lang.Long.compare(x.asLong, y.asLong)
    case (x, y) => x.asStr.compareTo(y.asStr)
  }

  /** `in` / `contains` membership: container on the right/left resp.
    * A container operand means contains-ALL-of
    * (cvar::containsAllOf, lib/var/var.h:559-584). */
  def contains(container: Value, item: Value): Boolean = item match {
    case VList(xs) => xs.forall(containsOne(container, _))
    case VSet(xs)  => xs.forall(containsOne(container, _))
    case _         => containsOne(container, item)
  }

  private def containsOne(container: Value, item: Value): Boolean = container match {
    case VList(xs) => xs.exists(eq(_, item))
    case VSet(xs)  => xs.exists(eq(_, item))
    case VDict(m)  => m.contains(item.asStr)
    case VStr(s)   => s.contains(item.asStr)
    case _         => false
  }

  /** `any`: does container share any element with the operand list/set. */
  def any(container: Value, items: Value): Boolean = {
    val its: Seq[Value] = items match {
      case VList(xs) => xs
      case VSet(xs)  => xs.toSeq
      case v         => Seq(v)
    }
    its.exists(contains(container, _))
  }

  def plus(a: Value, b: Value): Value = (a, b) match {
    case (VList(x), VList(y)) => VList(x ++ y)
    case (VList(x), y)        => VList(x :+ y)
    case (VSet(x), VSet(y))   => VSet(x ++ y)
    case (VSet(x), VList(y))  => VSet(x ++ y)
    case (VSet(x), y)         => VSet(x + y)
    case (VDict(x), VDict(y)) => VDict(x ++ y)
    case (VStr(x), y)         => VStr(x + y.asStr)
    case (x, VStr(y))         => VStr(x.asStr + y)
    case (VDbl(_), _) | (_, VDbl(_)) => VDbl(a.asDouble + b.asDouble)
    case _                    => VInt(a.asLong + b.asLong)
  }

  def minus(a: Value, b: Value): Value = (a, b) match {
    case (VList(x), VList(y)) => VList(x.filterNot(e => y.exists(eq(_, e))))
    case (VList(x), y)        => VList(x.filterNot(e => eq(e, y)))
    case (VSet(x), VList(y))  => VSet(x.filterNot(e => y.exists(eq(_, e))))
    case (VSet(x), y)         => VSet(x.filterNot(e => eq(e, y)))
    case (VDict(x), VList(y)) => VDict(x -- y.map(_.asStr))
    case (VDict(x), y)        => VDict(x - y.asStr)
    // string minus removes every occurrence of the operand
    // (cvar::subStrings, lib/var/var.h:655-664)
    case (VStr(x), y)         => VStr(removeAll(x, y.asStr))
    case (VDbl(_), _) | (_, VDbl(_)) => VDbl(a.asDouble - b.asDouble)
    case _                    => VInt(a.asLong - b.asLong)
  }

  private def removeAll(left: String, right: String): String =
    if (right.isEmpty) left
    else {
      var s = left
      var i = s.indexOf(right)
      while (i >= 0) { s = s.substring(0, i) + s.substring(i + right.length); i = s.indexOf(right) }
      s
    }

  def times(a: Value, b: Value): Value =
    if (a.isNumeric && b.isNumeric)
      (a, b) match {
        case (VDbl(_), _) | (_, VDbl(_)) => VDbl(a.asDouble * b.asDouble)
        case _ => VInt(a.asLong * b.asLong)
      }
    else VNone

  def div(a: Value, b: Value): Value =
    if (b.asDouble == 0.0) VNone else VDbl(a.asDouble / b.asDouble)
}
