package graft.sources

import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Manifest / link-file parsing (S7–S9): one URL per line, blanks and
  * `#` comments skipped, first whitespace token used. PubChem entries
  * derive an `.md5` checksum companion URL; ZINC entries map the URL
  * path to a relative mirror path. Reference:
  * /root/reference/src/open_molecule_data_pipeline/ingestion/
  * pubchem.py:104-143, chembl.py:86-102, zinc.py:110-136.
  *
  * Manifests are driver-side by design — hundreds to thousands of
  * lines that fan out into the distributed mirror/scan steps; parsing
  * them in Spark would be a pointless job per file.
  */
object Manifests {

  final case class ManifestEntry(
      url: String,
      fileName: String,
      checksumUrl: Option[String],
      relativePath: Option[String])

  private def lines(path: String): Seq[String] =
    Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8).asScala.toSeq

  private def urlTokens(path: String): Seq[String] =
    lines(path)
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.split("\\s+")(0))

  private def fileNameOf(url: String): String = {
    val p = new URI(url).getPath
    p.substring(p.lastIndexOf('/') + 1)
  }

  /** PubChem style: checksum companion at `<url>.md5`. */
  def parsePubChem(path: String): Seq[ManifestEntry] =
    urlTokens(path).map(u =>
      ManifestEntry(u, fileNameOf(u), Some(u + ".md5"), None))

  /** ChEMBL style: no checksums. */
  def parseChembl(path: String): Seq[ManifestEntry] =
    urlTokens(path).map(u => ManifestEntry(u, fileNameOf(u), None, None))

  /** ZINC style: URL path (leading `/` stripped) becomes the relative
    * mirror path, preserving tranche directory structure.
    */
  def parseZinc(path: String): Seq[ManifestEntry] =
    urlTokens(path).map { u =>
      val rel = new URI(u).getPath.dropWhile(_ == '/')
      ManifestEntry(u, fileNameOf(u), None, Some(rel))
    }
}
