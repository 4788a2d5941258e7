package graft.sources

/** Path-list parsing shared by the readers and the CLI. */
object PathPatterns {

  /** Split a comma-separated path list into individual patterns —
    * unless the string uses Hadoop brace-glob alternation
    * (`{a,b}` alternation segments), whose commas are part of ONE pattern and
    * must survive intact. Mixing brace globs with comma-separated
    * lists in a single string is unsupported (split ambiguity); pass
    * such inputs as separate source entries instead.
    */
  def split(paths: String): Seq[String] =
    if (paths.contains('{')) Seq(paths.trim).filter(_.nonEmpty)
    else paths.split(",").map(_.trim).filter(_.nonEmpty).toSeq
}
