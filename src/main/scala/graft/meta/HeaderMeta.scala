package graft.meta

import java.util.regex.Pattern
import scala.io.Source
import scala.util.Using

/** Header/metric dimension tables + fuzzy header matching.
  *
  * Seed data lives as checked-in TSV resources (extracted from the
  * reference's code/data.db: headingstable 40 rows, metric 294 rows —
  * SURVEY.md §1.2.5). At 40/294 rows this is driver-side metadata: lookups
  * are pure Scala over an in-memory map (no distributed join needed;
  * reference sqlite2_polars.py:167-288 does the same with lru_cache).
  */
object HeaderMeta {

  final case class Heading(id: Int, header: String, alias: String,
      description: String, keywd: Option[String])
  final case class MetricDoc(id: Int, metric: String, description: String)

  private def loadTsv(resource: String): Seq[Array[String]] = {
    val stream = getClass.getResourceAsStream(resource)
    require(stream != null, s"classpath resource $resource is missing")
    Using.resource(Source.fromInputStream(stream, "UTF-8")) { src =>
      src.getLines().drop(1).map(_.split("\t", -1)).toList
    }
  }

  lazy val headings: Seq[Heading] = loadTsv("/graft/headings.tsv").map { f =>
    Heading(f(0).toInt, f(1), f(2), f(3),
      Option(f(4)).filter(_.nonEmpty))
  }

  lazy val metrics: Seq[MetricDoc] = loadTsv("/graft/metrics.tsv").map { f =>
    MetricDoc(f(0).toInt, f(1), f(2))
  }

  private lazy val metricsByName: Map[String, String] =
    metrics.map(m => m.metric -> m.description).toMap

  def metricDescription(metric: String): String =
    metricsByName.getOrElse(metric, s"no description found for $metric")

  private lazy val byHeader: Map[String, Heading] =
    headings.map(h => h.header -> h).toMap
  private lazy val byAlias: Map[String, Heading] =
    headings.map(h => h.alias -> h).toMap
  lazy val allHeaders: Seq[String] = headings.map(_.header)

  def headerFromAlias(alias: String): Option[String] =
    byAlias.get(alias).map(_.header)

  /** Fuzzy header→row resolution (reference sqlite2_polars.py:178-227
    * `_header_prop`): exact match; else candidate headers gated by the
    * first ≤2 tokens (substring containment), a single candidate wins;
    * else score every candidate by full-token substring-overlap count and
    * take the first argmax; no candidates → None (caller falls back to
    * the raw header). */
  def resolve(header: String): Option[Heading] =
    byHeader.get(header).orElse {
      val toks = header.split("\\s+").toSeq
      val gate = toks.take(if (toks.length >= 2) 2 else 1)
      val candidates = allHeaders.filter(e => gate.exists(e.contains))
      candidates match {
        case Seq(one) => byHeader.get(one)
        case Seq() => None
        case many =>
          val best = many.maxBy(e => toks.count(e.contains))
          byHeader.get(best)
      }
    }

  /** Header → alias; unknown headers echo back (reference
    * helpers_pl.py:62-79 translate_headers). */
  def alias(header: String): String =
    resolve(header).map(_.alias).getOrElse(header)

  /** Alias → header, matched against the actual headers present in a file
    * (reference helpers_pl.py:81-96 translate_aliases + :100-113
    * aliases_2_header): db lookup first; if the db header isn't literally
    * present, score file headers by whole-token overlap with it. */
  def aliasToHeader(aliasStr: String, fileHeaders: Seq[String]): String = {
    val h0 = headerFromAlias(aliasStr).getOrElse(aliasStr)
    val h =
      if (fileHeaders.contains(h0)) h0
      else {
        var best = ""; var bestCount = 0
        for (fh <- fileHeaders) {
          val c = h0.split("\\s+").count(fh.split("\\s+").contains)
          if (c > bestCount) { bestCount = c; best = fh }
        }
        best
      }
    h.split("\\s+").mkString(" ")
  }

  private val falseNone = Pattern.compile("(False.*)|(None.*)",
    Pattern.CASE_INSENSITIVE)

  /** Is this header device-scoped, and with which tag (CPU|DEV|IFACE|...)?
    * (reference sqlite2_polars.py:241-288.) None = scalar section. The
    * reference's regex-alias fallback for unknown headers returns a bare
    * boolean; here unknown headers resolve through `resolve` first, which
    * covers the same inputs without the latent KeyError (SURVEY §7.4.3). */
  def subDeviceTag(header: String): Option[String] =
    resolve(header).flatMap(_.keywd).filterNot(k =>
      falseNone.matcher(k).find())

  def isDeviceScoped(header: String): Boolean = subDeviceTag(header).isDefined

  /** CPU-like headers collapse to device 'all' by default (reference
    * dia_compute_pl.py:23 soft_reg + api/services.py:39). */
  def isCpuLike(aliasStr: String): Boolean =
    aliasStr == "CPU" || aliasStr.toUpperCase.startsWith("SOFT")
}
