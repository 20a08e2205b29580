package graft.io

import scala.collection.mutable
import scala.util.matching.Regex

/** RIS codec (S8/S11) — reference: ris.py:10-128.
  *
  * Line-format parser for the four dialects the reference handles
  * (PubMed/MEDLINE blank-line delimited, Ovid EndNote "<n. >" headers,
  * Ovid RIS "n." headers, Wiley with ignorable provider lines), using
  * the same "record player" state machine: the needle drops on the
  * first tag line, continuation lines append to the last tag, and the
  * sniffed delimiter ends a record.
  *
  * Faithful quirks: tag = first 4 chars rstripped, value = chars from
  * column 6 — so only standard 2-char-tag lines ("TI  - x") round-trip
  * through dumps; per-line BOM defusal; a trailing unterminated record
  * is emitted.
  */
object Ris {

  type Record = Seq[(String, Seq[String])]

  private val risRe: Regex = "^[A-Z0-9]{1,4}\\s*\\-\\s".r
  private val delimOvidEn: Regex = "^\\<[1-9][0-9]*\\. \\>".r
  private val delimOvidRis: Regex = "^[1-9][0-9]*\\.".r
  private val delimPubmed: Regex = "^\\s*$".r
  private val wileyIgnores: Seq[Regex] = Seq(
    "^Record \\#[1-9]+[0-9]* of [1-9]+[0-9]*$".r,
    "^Provider: John Wiley & Sons, Ltd\\.$".r,
    "^Content: text\\/plain\\; charset\\=\\\"UTF\\-8\\\"$".r)

  private val Bom = "﻿"

  /** Dialect sniffed from the first line (ris.py:46-61). */
  def sniffDelim(firstLine: String): Regex =
    if (delimOvidEn.findPrefixOf(firstLine).isDefined) delimOvidEn
    else if (delimOvidRis.findPrefixOf(firstLine).isDefined) delimOvidRis
    else delimPubmed // blank-line start, straight-into-format, and default

  def loads(risString: String): Seq[Record] =
    parse(risString.linesIterator)

  def parse(lines: Iterator[String]): Seq[Record] = {
    val out = mutable.ArrayBuffer[Record]()
    var needleDown = false
    var entry = mutable.LinkedHashMap[String, mutable.ArrayBuffer[String]]()
    var lastKey: String = null
    var delim: Regex = delimPubmed
    var firstLine = true

    def emit(): Unit = {
      out += entry.toSeq.map { case (k, v) => (k, v.toSeq) }
      entry = mutable.LinkedHashMap[String, mutable.ArrayBuffer[String]]()
    }

    for (line0 <- lines) {
      val line = if (line0.startsWith(Bom)) line0.substring(1) else line0
      if (!wileyIgnores.exists(_.findPrefixOf(line).isDefined)) {
        if (firstLine) { firstLine = false; delim = sniffDelim(line) }
        if (!needleDown && risRe.findPrefixOf(line).isDefined) {
          needleDown = true
        } else if (needleDown && delim.findPrefixOf(line).isDefined) {
          emit()
          needleDown = false
        }
        if (needleDown) {
          val (key, value) =
            if (risRe.findPrefixOf(line).isDefined)
              (line.take(4).replaceAll("\\s+$", ""),
                line.drop(6).replaceAll("\\s+$", ""))
            else (lastKey, line.trim)
          entry.getOrElseUpdate(key, mutable.ArrayBuffer[String]()) += value
          lastKey = key
        }
      }
    }
    if (entry.nonEmpty) emit()
    out.toSeq
  }

  /** Serialize records (ris.py:112-128): "{tag}  - {value}" lines, each
    * record followed by a '\n\n\n' element in the '\n'-join.
    */
  def dumps(records: Seq[Record]): String = {
    val out = mutable.ArrayBuffer[String]()
    for (rec <- records) {
      for ((k, vs) <- rec; v <- vs) out += s"$k  - $v"
      out += "\n\n\n"
    }
    out.mkString("\n")
  }
}
