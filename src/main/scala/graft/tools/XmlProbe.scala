object XmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("xmlprobe")
    java.nio.file.Files.writeString(dir.resolve("t.xml"),
      """<Set><MedlineCitation Status="MEDLINE"><PMID>123</PMID><Article><ArticleTitle>Hi</ArticleTitle></Article></MedlineCitation></Set>""")
    val df = spark.read.format("xml").option("rowTag", "MedlineCitation").load(dir.toString)
    df.printSchema(); df.show(false)
    spark.stop()
  }
}
