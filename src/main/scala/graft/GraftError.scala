package graft

/** Typed error taxonomy for the engine (reference: the stringly
  * `Error{DataFusionError, YamlError, IoError, ReqwestError}` enum at
  * /root/reference/src/error.rs:7-40). Each variant wraps its cause so
  * callers can pattern-match instead of string-matching.
  */
sealed abstract class GraftError(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)

object GraftError {
  /** Bad or unsupported engine/query usage (≈ DataFusionError). */
  final case class AnalysisError(msg: String, cause: Throwable = null)
      extends GraftError(msg, cause)

  /** Malformed YAML / config semantics (≈ YamlError). */
  final case class ConfigError(msg: String, cause: Throwable = null)
      extends GraftError(msg, cause)

  /** Filesystem problems (≈ IoError). */
  final case class IoError(msg: String, cause: Throwable = null)
      extends GraftError(msg, cause)

  /** HTTP transport/status/parse problems (≈ ReqwestError). Carries the
    * response status when one was received. */
  final case class HttpError(msg: String, status: Int = -1, cause: Throwable = null)
      extends GraftError(msg, cause)

  /** An HTTP source returned zero rows. The reference panics on
    * `data.first().unwrap()` (/root/reference/src/datasources.rs:195);
    * we raise a typed error instead (SURVEY.md §7 divergence 3). */
  final case class EmptyResultError(url: String)
      extends GraftError(s"HTTP source returned no rows: $url", null)
}
