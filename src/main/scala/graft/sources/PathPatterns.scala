package graft.sources

/** Path-list parsing shared by the readers and the CLI. */
object PathPatterns {

  /** Split a comma-separated path list into individual patterns,
    * keeping Hadoop brace-glob alternation (`{a,b}` segments) intact:
    * only commas at brace depth zero separate entries. This also makes
    * mixed inputs work — a comma list where one entry contains a
    * brace glob (or a literal `{` in a file name) splits correctly,
    * where an any-brace-means-one-pattern rule would collapse the
    * whole list into a single bogus path.
    */
  def split(paths: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    paths.foreach {
      case '{' => depth += 1; cur.append('{')
      case '}' => if (depth > 0) depth -= 1; cur.append('}')
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur.append(c)
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
