package graft.io

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Driver-side ingest shim (S3; reference: pubmed.py:42-117,209-299 —
  * FTP listing, retrying downloads, md5 validation).
  *
  * The network transport is environment-specific and out-of-engine by
  * design (SURVEY §2.1/S3); what the engine owns is the contract the
  * transport must satisfy before a file enters the landing directory:
  *  - deterministic processing order (filename order — O4, the update
  *    files' apply-order invariant, pubmed.py:60-65);
  *  - checksum validation against the publisher's md5 sidecars
  *    (pubmed.py:289-299), with corrupt files quarantined rather than
  *    surfaced.
  */
object IngestShim {

  final case class Listed(path: String, name: String, md5Ok: Option[Boolean])

  def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map(b => f"$b%02x").mkString

  /** List data files in apply order; validate any `<name>.md5` sidecar
    * (containing the hex digest). md5Ok: None = no sidecar, Some(b) =
    * sidecar present and matched/mismatched.
    */
  def listValidated(dir: String, ext: String): Seq[Listed] = {
    val d = Paths.get(dir)
    val stream = Files.list(d)
    val all = try stream.iterator().asScala.toSeq finally stream.close()
    val dataFiles = all.filter(_.getFileName.toString.endsWith(ext))
      .sortBy(_.getFileName.toString)
    dataFiles.map { p =>
      val sidecar = Paths.get(p.toString + ".md5")
      val ok =
        if (!Files.exists(sidecar)) None
        else {
          val expected = Files.readString(sidecar).trim.toLowerCase
          Some(md5Hex(Files.readAllBytes(p)) == expected)
        }
      Listed(p.toString, p.getFileName.toString, ok)
    }
  }

  /** The files safe to hand to StreamIngest: validated (or
    * sidecar-less) files in apply order; corrupt files are excluded.
    */
  def applyList(dir: String, ext: String): Seq[Listed] =
    listValidated(dir, ext).filter(_.md5Ok.forall(identity))
}
