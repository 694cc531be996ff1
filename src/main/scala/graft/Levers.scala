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

  /** Positive-integer scale knob (graft.tiles, graft.kmeans.k, ...):
    * unset = default; set = a named parse + range error instead of a
    * bare NumberFormatException that doesn't say which knob was bad.
    */
  private[graft] def posInt(s: SparkSession, key: String,
                            default: Int): Int =
    s.conf.getOption(key).map { v =>
      val parsed = scala.util.Try(v.trim.toInt).toOption
      require(parsed.exists(_ >= 1),
        s"$key must be a positive integer, got '$v'")
      parsed.get
    }.getOrElse(default)

  /** Positive-long variant for row-count-scaled knobs
    * (graft.shingle_df_cap). `default` None = the knob is optional.
    */
  private[graft] def posLongOpt(s: SparkSession,
                                key: String): Option[Long] =
    s.conf.getOption(key).map { v =>
      val parsed = scala.util.Try(v.trim.toLong).toOption
      require(parsed.exists(_ >= 1L),
        s"$key must be a positive integer, got '$v'")
      parsed.get
    }
}
