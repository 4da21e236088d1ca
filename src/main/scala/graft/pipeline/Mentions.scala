package graft.pipeline

import org.apache.spark.sql.{Dataset, Encoders}
import scala.util.matching.Regex

/** Batched mention detection + pattern-rule relation extraction
  * (north_star: "pattern/dependency rules in mapPartitions over typed
  * Datasets"). Each rule is a compiled regex binding a subject surface, a
  * relation phrase, and an object surface; one page yields many mention
  * pairs (flatMap — generator/UDTF shape). Regexes are compiled once per
  * partition, not per row.
  */
object Mentions {

  final case class MentionPair(url: String, subjSurface: String, pred: String, objSurface: String)

  /** (relation phrase regex, predicate). Surface shapes are anchored so
    * free-form body text cannot produce spurious captures. */
  val rules: Seq[(String, String)] = Seq(
    ("""((?:Ent|Entity) \d+) was born in (city \d+)\.""", "bornIn"),
    ("""((?:Ent|Entity) \d+) works for (org \d+)\.""", "worksFor"),
    ("""(city \d+) is located in (country \d+)\.""", "locatedIn"))

  def apply(extracted: Dataset[Extract.Extracted]): Dataset[MentionPair] = {
    extracted.mapPartitions { rows =>
      val compiled: Seq[(Regex, String)] = rules.map { case (p, pred) => (p.r, pred) }
      rows.flatMap { e =>
        compiled.flatMap { case (re, pred) =>
          re.findAllMatchIn(e.text).map(m => MentionPair(e.url, m.group(1), pred, m.group(2)))
        }
      }
    }(Encoders.product[MentionPair])
  }

  final case class MentionPairTs(url: String, warc_ts: java.sql.Timestamp,
                                 subjSurface: String, pred: String, objSurface: String)

  /** Event-time-carrying variant over the SAME compiled rules (streaming
    * ingest; the ts rides along for the downstream watermark). */
  def withTs(extracted: Dataset[Extract.ExtractedTs]): Dataset[MentionPairTs] = {
    extracted.mapPartitions { rows =>
      val compiled: Seq[(Regex, String)] = rules.map { case (p, pred) => (p.r, pred) }
      rows.flatMap { e =>
        compiled.flatMap { case (re, pred) =>
          re.findAllMatchIn(e.text).map(m =>
            MentionPairTs(e.url, e.warc_ts, m.group(1), pred, m.group(2)))
        }
      }
    }(Encoders.product[MentionPairTs])
  }
}
