import scala.io.Source
object ShParity {
  def main(args: Array[String]): Unit = {
    val lines = Source.fromFile(args(0)).getLines().toSeq
    for ((l, i) <- lines.zipWithIndex) {
      val pairs = graft.annotate.SchwartzHearst.extractPairs(l)
      for ((k, v) <- pairs.toSeq.sortBy(_._1))
        println(s"$i\t$k\t$v")
    }
  }
}
