package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Download/mirror step (S10–S13): builds aria2c argv with resume,
  * segmented multi-connection download, retries, optional checksum
  * verification and basic auth; skips targets that already exist
  * non-empty when no checksum is requested. Reference:
  * /root/reference/src/open_molecule_data_pipeline/ingestion/
  * aria2.py:13-109.
  *
  * The process runner is injected (`Seq[String] => Int`) exactly like
  * the reference's test seam, so unit tests capture argv and write
  * fixture bytes without a network. At scale the URL list can be
  * distributed (`df.repartition(n).foreachPartition` invoking the same
  * runner per executor); driver-side sequential mirroring matches the
  * reference's behavior.
  */
object Aria2Mirror {

  /** Real subprocess runner (production path; zero-egress tests inject
    * fakes instead).
    */
  val realRunner: Seq[String] => Int = argv =>
    new ProcessBuilder(argv: _*).inheritIO().start().waitFor()

  final case class Options(
      connections: Int = 16,
      splits: Int = 16,
      minSplitSize: String = "1M",
      tries: Int = 5,
      retryWaitSec: Int = 2)

  final case class Auth(username: String, password: String)

  def args(url: String, outputPath: Path, checksum: Option[(String, String)] = None,
      auth: Option[Auth] = None, options: Options = Options()): Seq[String] = {
    val base = Seq(
      "aria2c",
      "--continue=true",
      s"--max-connection-per-server=${options.connections}",
      s"--split=${options.splits}",
      s"--min-split-size=${options.minSplitSize}",
      s"--max-tries=${options.tries}",
      s"--retry-wait=${options.retryWaitSec}",
      "--auto-file-renaming=false",
      "--allow-overwrite=true",
      s"--dir=${outputPath.getParent}",
      s"--out=${outputPath.getFileName}")
    val check = checksum.toSeq.flatMap { case (alg, value) =>
      Seq(s"--checksum=$alg=$value", "--check-integrity=true")
    }
    val login = auth.toSeq.flatMap(a =>
      Seq(s"--http-user=${a.username}", s"--http-passwd=${a.password}"))
    base ++ check ++ login :+ url
  }

  /** Idempotent single download (S12): cached non-empty file short-
    * circuits unless a checksum forces re-verification.
    */
  def download(url: String, outputPath: Path,
      runner: Seq[String] => Int,
      checksum: Option[(String, String)] = None,
      auth: Option[Auth] = None,
      skipExisting: Boolean = true,
      options: Options = Options()): Boolean = {
    if (skipExisting && checksum.isEmpty && Files.exists(outputPath)
        && Files.size(outputPath) > 0) return true
    Files.createDirectories(outputPath.getParent)
    runner(args(url, outputPath, checksum, auth, options)) == 0
  }

  /** Bulk mirror (S13): failures are logged-and-skipped (dead-letter
    * style, like PubChem/ChEMBL), successes returned.
    */
  def mirrorAll(entries: Seq[Manifests.ManifestEntry], targetDir: String,
      runner: Seq[String] => Int,
      options: Options = Options()): Seq[Path] =
    entries.flatMap { e =>
      val rel = e.relativePath.getOrElse(e.fileName)
      val target = Paths.get(targetDir, rel)
      if (download(e.url, target, runner, options = options)) Some(target)
      else {
        System.err.println(s"[mirror] failed, skipping: ${e.url}")
        None
      }
    }
}
