package graft.config

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Declarative ingestion job configuration: YAML → validated case
  * classes, mirroring the reference's pydantic schema and validations
  * (/root/reference/src/open_molecule_data_pipeline/ingestion/
  * runner.py:76-123: unknown source type rejected, duplicate names
  * rejected, positive batch size / concurrency).
  *
  * Parsed with Jackson's YAML dataformat (ships with Spark) into a
  * JsonNode tree and materialized by hand — no reflective databinding,
  * so validation errors carry precise messages.
  */
object JobConfig {

  final case class SourceSpec(
      sourceType: String,
      name: String,
      options: Map[String, String])

  /** `configHash` is the md5 of the raw YAML text this spec was parsed
    * from (provenance identity, system-plan.md:32) — empty for specs
    * constructed programmatically.
    */
  final case class JobSpec(
      outputDir: String,
      checkpointDir: String,
      batchSize: Int,
      concurrency: Int,
      compressOutput: Boolean,
      sources: Seq[SourceSpec],
      configHash: String = "")

  /** Source types the engine can build a reader for (S31 registry). */
  val KnownSourceTypes: Set[String] =
    Set("pubchem", "chembl", "zinc", "chemspider", "http", "delimited", "sdf")

  def load(path: String): JobSpec =
    parse(new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))

  def parse(yaml: String): JobSpec = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val root = mapper.readTree(yaml)
    val job = Option(root.get("job")).getOrElse(
      throw new IllegalArgumentException("config missing top-level 'job' key"))

    def str(n: JsonNode, k: String, default: Option[String] = None): String =
      Option(n.get(k)).map(_.asText()).orElse(default).getOrElse(
        throw new IllegalArgumentException(s"config missing '$k'"))

    val batchSize = Option(job.get("batch_size")).map(_.asInt()).getOrElse(1000)
    val concurrency = Option(job.get("concurrency")).map(_.asInt()).getOrElse(1)
    require(batchSize > 0, s"batch_size must be positive, got $batchSize")
    require(concurrency > 0, s"concurrency must be positive, got $concurrency")

    val srcNode = Option(job.get("sources")).getOrElse(
      throw new IllegalArgumentException("config missing 'sources'"))
    val sources = (0 until srcNode.size()).map { i =>
      val s = srcNode.get(i)
      val t = str(s, "type")
      if (!KnownSourceTypes(t))
        throw new IllegalArgumentException(
          s"unknown source type '$t' (known: ${KnownSourceTypes.toSeq.sorted.mkString(", ")})")
      val opts = Option(s.get("options")).map { o =>
        val it = o.properties().iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
        b.result()
      }.getOrElse(Map.empty[String, String])
      SourceSpec(t, str(s, "name"), opts)
    }
    val dup = sources.groupBy(_.name).collect { case (n, ss) if ss.size > 1 => n }
    require(dup.isEmpty, s"duplicate source names: ${dup.mkString(", ")}")

    JobSpec(
      outputDir = str(job, "output_dir"),
      checkpointDir = str(job, "checkpoint_dir"),
      batchSize = batchSize,
      concurrency = concurrency,
      compressOutput = Option(job.get("compress_output")).forall(_.asBoolean()),
      sources = sources,
      configHash = graft.operators.Provenance.configHash(yaml))
  }
}
