package graft

/** Artifact file writes for the measurement mains. A failed write must not
  * masquerade as success (ADVICE r13: StreamScale swallowed all Throwable
  * while stdout printed success JSON, so a stale artifact could be committed
  * as current evidence): only IOException is caught, a warning goes to
  * stderr, and the caller gets `false` to exit nonzero on. */
object ArtifactOut {
  def write(path: String, json: String): Boolean =
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      true
    } catch {
      case e: java.io.IOException =>
        System.err.println(s"WARN: failed to write artifact $path: ${e.getMessage}")
        false
    }
}
