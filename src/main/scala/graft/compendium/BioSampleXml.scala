package graft.compendium

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 (db.py:194-261): BioSample "Full XML" export ingest.
  *
  * The reference does a whole-document `ET.parse` on the driver — at
  * "hundreds of thousands of samples" that is a single-node memory wall.
  * Here the file is split on `</BioSample>` record boundaries by the text
  * source (`lineSep`), so a 100 TB export scans in parallel across
  * executors with no driver materialization, and each record is parsed by a
  * small pull-free extractor inside the scan's mapPartitions.
  *
  * Semantics preserved exactly (db.py:223-261):
  *  - SRA id = text of the LAST `<Id db="SRA">` element (loop w/o break);
  *    records without one are skipped;
  *  - tag name = `harmonized_name` attr if present else `attribute_name`,
  *    later attributes overwrite earlier ones with the same name;
  *  - tag values lowercased; attributes with empty text skipped.
  */
object BioSampleXml {

  private val IdRe =
    """(?s)<Id\b([^>]*)>(.*?)</Id>""".r
  private val AttrRe =
    """(?s)<Attribute\b([^>]*)>(.*?)</Attribute>""".r
  private val XmlAttrRe =
    """([\w:_-]+)\s*=\s*("([^"]*)"|'([^']*)')""".r
  private val CharRefRe = """&#(x[0-9a-fA-F]+|[0-9]+);""".r

  /** The five named entities plus numeric character references
    * (&#NNN; / &#xNN;), matching ElementTree's expansion for the inputs the
    * reference parses. &amp; last so escaped entities don't double-expand.
    */
  private[compendium] def unescape(s: String): String = {
    val numeric =
      if (s.indexOf("&#") < 0) s
      else CharRefRe.replaceAllIn(s, m => {
        val body = m.group(1)
        val cp = if (body.charAt(0) == 'x' || body.charAt(0) == 'X')
          Integer.parseInt(body.substring(1), 16)
        else Integer.parseInt(body)
        java.util.regex.Matcher.quoteReplacement(new String(Character.toChars(cp)))
      })
    numeric.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&")
  }

  private def xmlAttrs(s: String): Map[String, String] =
    XmlAttrRe.findAllMatchIn(s).map { m =>
      val v = if (m.group(3) != null) m.group(3) else m.group(4)
      m.group(1) -> unescape(v)
    }.toMap

  /** Parse one `<BioSample>…` chunk → (srs, tags) or None if no SRA id. */
  private[compendium] def parseRecord(chunk: String)
      : Option[(String, Seq[(String, String)])] = {
    if (!chunk.contains("<BioSample")) return None
    var sra: Option[String] = None
    for (m <- IdRe.findAllMatchIn(chunk))
      if (xmlAttrs(m.group(1)).get("db").contains("SRA"))
        sra = Some(unescape(m.group(2)).trim)   // last wins (db.py:230-232)
    sra.filter(_.nonEmpty).map { id =>
      // LinkedHashMap: later same-name attributes overwrite, insertion
      // order retained (python dict semantics, db.py:248-256)
      val tags = scala.collection.mutable.LinkedHashMap.empty[String, String]
      for (m <- AttrRe.findAllMatchIn(chunk)) {
        val text = unescape(m.group(2))
        if (text.nonEmpty) {
          val attrs = xmlAttrs(m.group(1))
          attrs.get("harmonized_name").orElse(attrs.get("attribute_name"))
            .foreach(name => tags(name) = text.toLowerCase)
        }
      }
      (id, tags.toSeq)
    }
  }

  /** Distributed scan: one row per BioSample with its tag array.
    * Schema: (srs String, tags Array[Struct[tag, value]]).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("lineSep", "</BioSample>").text(path)
      .as[String]
      .flatMap(parseRecord(_))
      .toDF("srs", "kv")
      .select(col("srs"),
        col("kv").cast("array<struct<tag:string,value:string>>").as("tags"))
  }

  /** samples-table rows (db.py:244): (srs, taxon). */
  def samples(parsed: DataFrame, taxon: String): DataFrame =
    parsed.select(col("srs"), lit(taxon).as("taxon"))

  /** tags-table rows (db.py:258-260): explode to the EAV long form. */
  def tags(parsed: DataFrame): DataFrame =
    parsed.select(col("srs"), explode(col("tags")).as("t"))
      .select(col("srs"), col("t.tag").as("tag"), col("t.value").as("value"))
}
