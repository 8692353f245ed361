package graft.catalog

import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._

/** DSv2 runtime `Predicate` → `sources.Filter` conversion for
  * file-level pruning. Spark hands runtime filters (dynamic partition
  * pruning / row-level group filters) to `SupportsRuntimeV2Filtering`
  * as v2 predicates over catalyst-INTERNAL literals; FileSkipping and
  * BloomIndex speak external values. Only the shapes runtime filters
  * actually take (IN / = over column+literals) convert; anything else
  * returns None and the caller keeps the files — pruning is an
  * optimization, never a correctness decision.
  * (The conversion utilities Spark has for this are private[sql].)
  */
private[catalog] object RuntimePredicates {

  /** Catalyst-internal literal → external value FileSkipping groks;
    * None for types we don't prune on (conservative keep). */
  def external(l: Literal[_]): Option[Any] = l.dataType match {
    case StringType => Option(l.value).map(_.toString)
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
      Option(l.value)
    case DateType =>
      Option(l.value).map(d => java.time.LocalDate.ofEpochDay(d.asInstanceOf[Int].toLong))
    case TimestampType =>
      Option(l.value).map { m =>
        val micros = m.asInstanceOf[Long]
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
      }
    case _ => None
  }

  /** The runtime filter arrives as IN / = over column literals;
    * anything else is ignored. */
  def toV1(p: Predicate): Option[sources.Filter] = {
    val kids = p.children().toSeq
    (p.name(), kids) match {
      case ("IN", Seq(ref: NamedReference, rest @ _*))
          if rest.forall(_.isInstanceOf[Literal[_]]) =>
        val vals = rest.map(v => external(v.asInstanceOf[Literal[_]]))
        if (vals.forall(_.isDefined))
          Some(sources.In(ref.fieldNames().mkString("."), vals.flatten.toArray))
        else None
      case ("=", Seq(ref: NamedReference, l: Literal[_])) =>
        external(l).map(v => sources.EqualTo(ref.fieldNames().mkString("."), v))
      case _ => None
    }
  }
}
