package graft

import org.apache.spark.sql.SparkSession

/** Strict parsing for the two-state A/B lever configs. A lever is
  * either unset (the shipped branch) or set to EXACTLY its documented
  * fallback value; any other value is a loud error. Before this, the
  * string levers were read with `contains(fallback)`, so a typo'd
  * value ("agh", "of") silently selected the SHIPPED branch — in an
  * A/B probe that turns the comparison into A/A and silently
  * invalidates the measurement. Same error discipline as
  * SPARK_GRAFT_CTL_WINDOW, graft.q278_group, and
  * graft.graph_edge_prepartition (ADVICE r12 class).
  */
object Levers {
  /** True iff `key` is set to `fallback`; false iff unset; throws on
    * anything else (including the never-documented "defaults" like
    * "scalar" or "on" — unset IS the default spelling).
    */
  private[graft] def isSet(s: SparkSession, key: String,
                           fallback: String): Boolean =
    s.conf.getOption(key) match {
      case None => false
      case Some(v) if v == fallback => true
      case Some(v) => throw new IllegalArgumentException(
        s"$key must be unset or '$fallback', got '$v'")
    }
}
