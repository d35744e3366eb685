package graft.pipeline

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.security.MessageDigest

import javax.imageio.ImageIO

/** PDF→page-image rasterization (P14/G2; reference
  * `pdf_converter/gen_pdf_imgLambda.py:51-57` uses poppler via pdf2image).
  *
  * No PDF rendering library ships in this environment, so the DECODE step is
  * a clearly-marked deterministic stub: page COUNT is parsed from the real
  * PDF structure (`/Type /Page` objects), and each "rendered" page is a real
  * JPEG (javax.imageio) whose pixels derive deterministically from
  * (pdf bytes, page index). Everything around the stub — binaryFile
  * ingestion, the 1→N flatMap, binary-column handling, the image sink, the
  * downstream crop join — is real and exercised end-to-end. Swapping in a
  * real renderer (e.g. PDFBox's PDFRenderer) changes ONLY [[renderPage]].
  */
trait PageRasterizer extends Serializable {
  /** One JPEG byte array per page of the given PDF. */
  def rasterize(pdfBytes: Array[Byte]): Seq[Array[Byte]]
}

object StubRasterizer extends PageRasterizer {

  /** Stub page dimensions (a real 300-DPI A4 render would be 2480x3508;
    * the stub renders small to keep fixtures fast).
    */
  val PageWidth = 248
  val PageHeight = 350

  // [^s] (not a lookahead) so the DuckDB oracle — RE2, no lookahead — can
  // use the EXACT same pattern: both engines miscount the same inputs the
  // same way, which is the parity that matters
  private val PageMarker = "/Type\\s*/Page[^s]".r

  /** Page count from the PDF object structure — real parsing, works on any
    * uncompressed-object PDF (incl. the checked-in fixtures).
    */
  def pageCount(pdfBytes: Array[Byte]): Int = {
    val text = new String(pdfBytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    PageMarker.findAllIn(text).size
  }

  override def rasterize(pdfBytes: Array[Byte]): Seq[Array[Byte]] =
    (0 until pageCount(pdfBytes)).map(renderPage(pdfBytes, _))

  /** STUB render: deterministic solid fill + page-index band derived from
    * md5(pdf bytes). Replace with a real renderer to leave stub-land.
    */
  private def renderPage(pdfBytes: Array[Byte], pageIdx: Int): Array[Byte] = {
    val digest = MessageDigest.getInstance("MD5").digest(pdfBytes)
    val rgb = ((digest(0) & 0xff) << 16) | ((digest(1) & 0xff) << 8) | (digest(2) & 0xff)
    val img = new BufferedImage(PageWidth, PageHeight, BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    try {
      g.setColor(new java.awt.Color(rgb))
      g.fillRect(0, 0, PageWidth, PageHeight)
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(0, (pageIdx * 13) % PageHeight, PageWidth, 10)
    } finally g.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }
}

/** Deterministic fixture binaries for the raw zone (FIXTURES.md A3): a
  * hand-written minimal PDF (uncompressed objects, one `/Type /Page` per
  * page) that the stub rasterizer can page-count.
  */
object FixtureBinaries {

  def minimalPdf(nPages: Int): Array[Byte] = {
    val kids = (0 until nPages).map(i => s"${3 + i} 0 R").mkString(" ")
    val pages = (0 until nPages).map { i =>
      s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 595 842] >> endobj"
    }.mkString("\n")
    val doc =
      s"""%PDF-1.4
         |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
         |2 0 obj << /Type /Pages /Kids [$kids] /Count $nPages >> endobj
         |$pages
         |trailer << /Root 1 0 R >>
         |%%EOF
         |""".stripMargin
    doc.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Write the raw-zone PDF fixtures matching the checked-in silver JSON
    * fixtures (same {province}/{date_range} keys, 2 pages each). Idempotent.
    */
  def writeRawPdfs(rawRoot: String): Unit = {
    import java.nio.file.{Files, Paths}
    Seq(
      "Gauteng/13_February_-_15_February_2026.pdf",
      "Eastern_Cape/20_February_-_22_February_2026.pdf"
    ).foreach { rel =>
      val p = Paths.get(s"$rawRoot/PnP/$rel")
      Files.createDirectories(p.getParent)
      Files.write(p, minimalPdf(2))
    }
  }
}
