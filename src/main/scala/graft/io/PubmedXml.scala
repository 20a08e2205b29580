package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.domain.Rules

/** PubMed MedlineCitation reader (S1/S2) on Spark 4's built-in XML
  * data source, with the reference's ~18-field record projection
  * (readers/pmreader.py:50-183) expressed as native Column logic.
  *
  * Scale notes: the XML source streams elements per rowTag — a 30 GB
  * baseline file set parallelizes per-file, and the projection is one
  * map-side select (title chain, year fallback, page stitch, abstract
  * flatten are all codegen'd expressions from graft.domain.Rules).
  * CDC: `DeleteCitation` tombstones (pubmed.py:316-317) are read with a
  * second rowTag pass and feed TableStore.merge.
  */
object PubmedXml {

  /** Declared schema (SURVEY §1.2: the reader's shape is static — never
    * rely on inference for a production ingest).
    */
  private val abstractT = StructType(Seq(
    StructField("AbstractText", ArrayType(StructType(Seq(
      StructField("_Label", StringType),
      StructField("_VALUE", StringType)))))))

  private val authorT = StructType(Seq(
    StructField("LastName", StringType),
    StructField("ForeName", StringType),
    StructField("Initials", StringType),
    StructField("AffiliationInfo", StructType(Seq(
      StructField("Affiliation", StringType))))))

  private val pubDateT = StructType(Seq(
    StructField("Year", StringType),
    StructField("Month", StringType),
    StructField("MedlineDate", StringType)))

  private val journalT = StructType(Seq(
    StructField("Title", StringType),
    StructField("ISOAbbreviation", StringType),
    StructField("JournalIssue", StructType(Seq(
      StructField("Volume", StringType),
      StructField("Issue", StringType),
      StructField("PubDate", pubDateT))))))

  private val dataBankListT = StructType(Seq(
    StructField("DataBank", StructType(Seq(
      StructField("AccessionNumberList", StructType(Seq(
        StructField("AccessionNumber", ArrayType(StringType))))))))))

  private val articleT = StructType(Seq(
    StructField("ArticleTitle", StringType),
    StructField("VernacularTitle", StringType),
    StructField("Language", StringType),
    StructField("Abstract", abstractT),
    StructField("AuthorList", StructType(Seq(
      StructField("Author", ArrayType(authorT))))),
    StructField("Journal", journalT),
    StructField("Pagination", StructType(Seq(
      StructField("MedlinePgn", StringType)))),
    StructField("PublicationTypeList", StructType(Seq(
      StructField("PublicationType", ArrayType(StringType))))),
    StructField("ELocationID", ArrayType(StructType(Seq(
      StructField("_EIdType", StringType),
      StructField("_VALUE", StringType))))),
    StructField("DataBankList", dataBankListT)))

  val schema: StructType = StructType(Seq(
    StructField("_Status", StringType),
    StructField("_IndexingMethod", StringType),
    StructField("PMID", StringType),
    StructField("Article", articleT),
    StructField("MeshHeadingList", StructType(Seq(
      StructField("MeshHeading", ArrayType(StructType(Seq(
        StructField("DescriptorName", StringType)))))))),
    StructField("OtherID", ArrayType(StringType))))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "MedlineCitation")
      .schema(schema)
      .load(path)

  /** DeleteCitation tombstone pmids (S10; pubmed.py:316-317,534-538). */
  def readDeletions(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "DeleteCitation")
      .schema(StructType(Seq(StructField("PMID", ArrayType(StringType)))))
      .load(path)
      .select(explode(col("PMID")).as("pmid"))

  /** The to_dict() projection (pmreader.py:158-177), flattened. */
  def project(df: DataFrame): DataFrame = {
    val art = col("Article")
    val sections = transform(
      art.getField("Abstract").getField("AbstractText"),
      s => struct(
        coalesce(s.getField("_Label"), lit("_UNSTRUCTURED")).as("header"),
        coalesce(s.getField("_VALUE"), lit("")).as("text")))
    val pages = Rules.pageRange(coalesce(
      art.getField("Pagination").getField("MedlinePgn"), lit("")))
    val pubDate = art.getField("Journal").getField("JournalIssue").getField("PubDate")
    val dois = filter(art.getField("ELocationID"),
      e => e.getField("_EIdType") === "doi")
    df.select(
      col("PMID").as("pmid"),
      col("_Status").as("status"),
      coalesce(col("_IndexingMethod"), lit("Human")).as("indexing_method"),
      Rules.titleChain(art.getField("ArticleTitle"),
        art.getField("VernacularTitle")).as("ti"),
      coalesce(Rules.abstractFlatten(sections), lit("")).as("ab"),
      transform(art.getField("AuthorList").getField("Author"),
        a => struct(
          a.getField("LastName").as("LastName"),
          a.getField("ForeName").as("ForeName"),
          a.getField("Initials").as("Initials"),
          a.getField("AffiliationInfo").getField("Affiliation").as("Affiliation")))
        .as("authors"),
      art.getField("Journal").getField("Title").as("journal"),
      art.getField("Journal").getField("ISOAbbreviation").as("journal_abbrv"),
      Rules.yearExtract(pubDate.getField("Year"),
        pubDate.getField("MedlineDate")).as("year"),
      pubDate.getField("Month").as("month"),
      art.getField("Journal").getField("JournalIssue").getField("Volume").as("volume"),
      art.getField("Journal").getField("JournalIssue").getField("Issue").as("issue"),
      pages.getField("page_from").as("page_from"),
      pages.getField("page_to").as("page_to"),
      art.getField("PublicationTypeList").getField("PublicationType").as("ptyp"),
      art.getField("DataBankList").getField("DataBank")
        .getField("AccessionNumberList").getField("AccessionNumber").as("registry_ids"),
      transform(dois, e => e.getField("_VALUE")).as("dois"),
      transform(col("MeshHeadingList").getField("MeshHeading"),
        m => m.getField("DescriptorName")).as("mesh"),
      art.getField("Language").as("language"))
  }
}
