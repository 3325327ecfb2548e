package graft.functions

/** URL normalization with the reference's exact purell flag set.
  *
  * core/normalize.go:9-29 uses FlagsUsuallySafeGreedy | RemoveDuplicateSlashes
  * | RemoveFragment | LowercaseScheme | LowercaseHost | UppercaseEscapes,
  * which expands to (purell.go:26-76): lowercase scheme+host, uppercase/decode
  * unnecessary escapes + encode necessary (all canonical re-serialization),
  * remove default port, remove empty query separator, remove dot segments,
  * remove duplicate slashes, remove fragment, remove trailing slash (last).
  *
  * NOTE (SURVEY §1.3): the reference exposes normalization but does NOT apply
  * it on the storage path — urls are stored verbatim. The engine mirrors that:
  * this function is surfaced as an operator but never applied before storage.
  */
object Normalize {

  def normalizeUrlString(raw: String): Either[String, String] =
    GoUrl.parse(raw).map(normalize).map(_.serialize)

  def normalize(u0: GoUrl): GoUrl = {
    // drop rawPath so serialization re-escapes canonically from the decoded
    // path — this realizes FlagUppercaseEscapes / FlagDecodeUnnecessaryEscapes
    // / FlagEncodeNecessaryEscapes exactly the way purell's final
    // urlesc.Escape(u) does (purell.go:55-57 comment)
    var u = u0.copy(rawPath = "")
    // FlagLowercaseScheme: already done by parse (Go 1.1 behavior)
    // FlagLowercaseHost
    u = u.copy(host = u.host.toLowerCase(java.util.Locale.ROOT))
    // FlagRemoveDefaultPort
    if ((u.scheme == "http" && u.host.endsWith(":80")) )
      u = u.copy(host = u.host.dropRight(3))
    else if (u.scheme == "https" && u.host.endsWith(":443"))
      u = u.copy(host = u.host.dropRight(4))
    // FlagRemoveDotSegments (absolute paths only, like purell)
    if (u.path.startsWith("/"))
      u = GoUrl.setPath(u, GoUrl.resolvePath(u.escapedPath, ""))
    // FlagRemoveFragment
    u = u.copy(fragment = "")
    // FlagRemoveDuplicateSlashes
    if (u.path.contains("//"))
      u = u.copy(path = u.path.replaceAll("/{2,}", "/"), rawPath = "")
    // FlagRemoveEmptyQuerySeparator: forceQuery dropped on serialize
    u = u.copy(forceQuery = false)
    // FlagRemoveTrailingSlash (must be last)
    if (u.path.endsWith("/"))
      u = u.copy(path = u.path.dropRight(1), rawPath = "")
    u
  }
}
