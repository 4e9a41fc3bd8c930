package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Stream-name algebra as Catalyst column functions.
  *
  * Reference semantics: jet/propulsion src/Propulsion/Streams.fs:61-78
  * (`StreamName.parseWithDefaultCategory` / `categorize`) and
  * src/Propulsion/StreamFilter.fs:6-46 (allow/deny lists + regexes,
  * `$`-prefixed system-stream exclusion).
  *
  * All of these are plain Catalyst expressions — they stay inside
  * whole-stage codegen and push down to the scan where possible.
  */
object StreamFunctions {

  /** `"{category}-{streamId}"` → category (prefix before first '-'). */
  def categoryOf(streamName: Column): Column =
    when(streamName.contains("-"), split(streamName, "-", 2).getItem(0))
      .otherwise(streamName)

  /** `"{category}-{streamId}"` → streamId (suffix after first '-'). */
  def streamIdOf(streamName: Column): Column =
    when(streamName.contains("-"), split(streamName, "-", 2).getItem(1))
      .otherwise(streamName)

  /** Coerce to well-formed `{category}-{id}` with a default category
    * (Streams.fs:61-72 `parseWithDefaultCategory`). */
  def withDefaultCategory(raw: Column, defaultCategory: String): Column =
    when(raw.isNull, lit(null))
      .when(!raw.contains("-"), concat(lit(defaultCategory), lit("-"), raw))
      .otherwise(raw)

  /** System streams are `$`-prefixed (StreamFilter.fs:28). */
  def isSystemStream(streamName: Column): Column = streamName.startsWith("$")

  /** Drop snapshot rows before processing (`EventsOnly` / `stripUnfolds`,
    * Streams.fs:145-147), for envelopes carrying an is_unfold column. */
  def stripUnfolds(df: org.apache.spark.sql.DataFrame,
      isUnfoldCol: String = "is_unfold"): org.apache.spark.sql.DataFrame =
    df.where(!col(isUnfoldCol))

  /** Allow/deny-list + regex stream filter (StreamFilter.fs:6-46).
    *
    * Empty allow-lists admit everything in that dimension; deny always
    * wins; system streams are excluded unless explicitly allowed.
    *
    * Entry semantics follow the reference's `isPlain` partition
    * (StreamFilter.fs:16-22): an entry whose every char is a
    * letter/digit/underscore is an exact VALUE (hash-set membership);
    * any other entry is a regex PATTERN matched UNANCHORED
    * (`Regex.IsMatch` finds anywhere — Spark `rlike` has the same
    * find-anywhere contract), so `"^\\$"` denies system streams and
    * `"Order.*"` admits every category with that prefix.
    */
  final case class StreamFilter(
      allowCategories: Seq[String] = Nil,
      denyCategories: Seq[String] = Nil,
      allowStreams: Seq[String] = Nil,
      denyStreams: Seq[String] = Nil,
      allowEventTypes: Seq[String] = Nil,
      denyEventTypes: Seq[String] = Nil,
      includeSystem: Boolean = false) {

    // StreamFilter.fs:16 — Char.IsLetterOrDigit || '_'. Seq.forall on
    // an empty string is true, so "" is a PLAIN exact value (matched
    // via isin) — classifying it as a pattern would make rlike("")
    // match every value and a single empty deny entry deny everything.
    private def isPlain(s: String): Boolean =
      s.forall(ch => Character.isLetterOrDigit(ch) || ch == '_')

    private def anyOf(c: Column, vs: Seq[String]): Column = {
      val (values, patterns) = vs.partition(isPlain)
      val tests =
        (if (values.isEmpty) Nil else Seq(c.isin(values: _*))) ++
          patterns.map(p => c.rlike(p))
      tests.reduce(_ || _)
    }

    def predicate(streamName: Column, eventType: Column): Column = {
      val cat = categoryOf(streamName)
      val allows = Seq(
        if (allowCategories.isEmpty) None else Some(anyOf(cat, allowCategories)),
        if (allowStreams.isEmpty) None else Some(anyOf(streamName, allowStreams)),
        if (allowEventTypes.isEmpty) None else Some(anyOf(eventType, allowEventTypes)))
      val denies = Seq(
        if (denyCategories.isEmpty) None else Some(!anyOf(cat, denyCategories)),
        if (denyStreams.isEmpty) None else Some(!anyOf(streamName, denyStreams)),
        if (denyEventTypes.isEmpty) None else Some(!anyOf(eventType, denyEventTypes)))
      val sys = if (includeSystem) None else Some(!isSystemStream(streamName))
      (allows.flatten ++ denies.flatten ++ sys).foldLeft(lit(true))(_ && _)
    }
  }
}
