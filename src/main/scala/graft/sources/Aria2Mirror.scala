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

  /** Fetch and parse a manifest entry's checksum companion (S11,
    * reference pubchem.py `_load_checksum`): download it when missing
    * or empty (never skip-existing an empty stub), take the first
    * whitespace token as the digest. Returns None when the entry has
    * no checksum URL; throws when the companion can't be fetched or is
    * empty — the caller dead-letters the entry.
    */
  def loadChecksum(entry: Manifests.ManifestEntry, targetDir: String,
      runner: Seq[String] => Int,
      algorithm: String = "md5",
      options: Options = Options()): Option[(String, String)] =
    entry.checksumUrl.map { cu =>
      val rel = entry.relativePath.getOrElse(entry.fileName)
      val path = Paths.get(targetDir, rel + "." + algorithm)
      if (!Files.exists(path) || Files.size(path) == 0) {
        Files.createDirectories(path.getParent)
        if (runner(args(cu, path, options = options)) != 0)
          throw new java.io.IOException(s"checksum fetch failed: $cu")
      }
      val content = Files.readString(path).trim
      if (content.isEmpty)
        throw new IllegalStateException(s"checksum file is empty: $path")
      (algorithm, content.split("\\s+")(0))
    }

  /** Bulk mirror (S13): failures are logged-and-skipped (dead-letter
    * style, like PubChem/ChEMBL), successes returned. A cached
    * non-empty archive short-circuits before any checksum work
    * (reference pubchem.py `_ensure_archive`); fresh downloads of
    * checksum-bearing entries fetch the companion digest and run
    * aria2c with `--checksum`/`--check-integrity`.
    */
  def mirrorAll(entries: Seq[Manifests.ManifestEntry], targetDir: String,
      runner: Seq[String] => Int,
      options: Options = Options()): Seq[Path] =
    entries.flatMap { e =>
      val rel = e.relativePath.getOrElse(e.fileName)
      val target = Paths.get(targetDir, rel)
      try {
        if (Files.exists(target) && Files.size(target) > 0) Some(target)
        else {
          val checksum = loadChecksum(e, targetDir, runner, options = options)
          if (download(e.url, target, runner, checksum = checksum,
              options = options)) Some(target)
          else {
            System.err.println(s"[mirror] failed, skipping: ${e.url}")
            None
          }
        }
      } catch {
        case ex: Exception =>
          System.err.println(s"[mirror] ${ex.getMessage}, skipping: ${e.url}")
          None
      }
    }
}
