package graft

import org.apache.spark.sql.DataFrame

/** Conveniences so the 3-arg operator forms read like the reference's
  * tuple syntax (/root/reference/README.md:35-39):
  * `dpp.common(Seq(dpp.x, dpp.y), fn, Seq(dpp.a, dpp.b))` or with the
  * implicits below simply `dpp.common(dpp.x, fn, dpp.a)`.
  */
package object pipeline {
  import scala.language.implicitConversions

  /** Single-var shorthand: `x >> fn >> y` ≙ `V(x) >> fn >> V(y)`
    * (README.md:243-250) — already native via RefLike.>> — plus the
    * 3-arg form taking bare refs.
    */
  implicit def refToSeq(r: RefLike): Seq[RefLike] = Seq(r)
  implicit def refsToSeq(rs: Refs): Seq[RefLike] = rs.refs

  /** Named step functions for readable debug traces. */
  def fn(label: String)(f: DataFrame => DataFrame): MapFn = MapFn(label, f)
  def fanIn(label: String)(f: Seq[DataFrame] => Seq[DataFrame]): FanInFn = FanInFn(label, f)
  def fanIn1(label: String)(f: Seq[DataFrame] => DataFrame): FanInFn = FanInFn.one(label)(f)
}
