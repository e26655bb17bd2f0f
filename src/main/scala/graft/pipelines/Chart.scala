package graft.pipelines

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Renders the BenchGrid results grid (size × method → seconds) to a
  * standalone SVG line chart — the analog of the reference's README
  * results figure (`README.md:326`; its matplotlib dependency renders a
  * time-vs-size chart per library). Pure JVM string assembly: the
  * results frame is a handful of driver-side rows by construction (one
  * per sample size), so no plotting library and no executor work.
  *
  * Design contract (kept deliberately boring and readable):
  *   - log₁₀ x (rows) and log₁₀ y (seconds) — benchmark scaling curves
  *     are read as slopes, and sizes/times both span orders of magnitude;
  *   - one fixed categorical color per method (validated 4-slot palette,
  *     assigned in method order, never cycled);
  *   - 2px series lines, 8px markers, recessive decade grid;
  *   - every series direct-labeled at its right end IN TEXT INK (two
  *     palette slots sit below 3:1 on the light surface, so color alone
  *     never carries identity — the relief rule) plus a legend row;
  *   - failed cells (negative seconds) are simply absent from the line.
  */
object Chart {

  /** Fixed categorical assignment: slot i ↔ methods(i), stable across
    * renders regardless of which methods have data. Never cycled: methods
    * past the validated 4-slot palette render in neutral gray (identity
    * still carried by the direct label and legend text, never color
    * alone). */
  private val SeriesColors = Seq("#2a78d6", "#eb6834", "#1baf7a", "#eda100")
  private val OverflowColor = "#9a9891"
  private def seriesColor(i: Int): String =
    if (i < SeriesColors.length) SeriesColors(i) else OverflowColor

  private val W = 760.0
  private val H = 440.0
  private val ML = 64.0; private val MR = 150.0
  private val MT = 52.0; private val MB = 52.0

  private def esc(s: String): String =
    s.flatMap { case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
                case '"' => "&quot;"; case c => c.toString }

  /** Write `outPath` from the wide results frame (`size` + one column per
    * method, seconds; negative = failed cell). Returns the SVG text. */
  def resultsSvg(wide: DataFrame, methods: Seq[String], outPath: String): String = {
    val rows = wide.select("size", methods: _*).collect()
    // null cells (a combination absent from the pivot input) and failed
    // cells (negative seconds) are both simply absent from the line;
    // size is read type-agnostically (int or long columns both occur)
    val pts: Seq[(String, Seq[(Double, Double)])] = methods.zipWithIndex.map {
      case (m, i) =>
        m -> rows.toSeq
          .filter(r => !r.isNullAt(0) && !r.isNullAt(i + 1))
          .map(r => (r.getAs[Number](0).doubleValue, r.getAs[Number](i + 1).doubleValue))
          .filter { case (s, t) => s > 0 && t > 0 }
          .sortBy(_._1)
    }
    val all = pts.flatMap(_._2)
    // degenerate domains (one size, equal times) get half-decade padding
    def pad(lo: Double, hi: Double) =
      if (hi - lo < 1e-9) (lo - 0.5, hi + 0.5) else (lo, hi)
    val (x0, x1) = pad(
      math.floor(all.map(p => math.log10(p._1)).minOption.getOrElse(0.0)),
      math.ceil(all.map(p => math.log10(p._1)).maxOption.getOrElse(1.0)))
    val (y0, y1) = pad(
      math.floor(all.map(p => math.log10(p._2)).minOption.getOrElse(0.0)),
      math.ceil(all.map(p => math.log10(p._2)).maxOption.getOrElse(1.0)))
    def sx(v: Double) = ML + (math.log10(v) - x0) / (x1 - x0) * (W - ML - MR)
    def sy(v: Double) = H - MB - (math.log10(v) - y0) / (y1 - y0) * (H - MT - MB)

    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 ${W.toInt} ${H.toInt}" font-family="system-ui, sans-serif">"""
    sb ++= s"""<rect width="${W.toInt}" height="${H.toInt}" fill="#fcfcfb"/>"""
    sb ++= s"""<text x="$ML" y="28" font-size="16" fill="#0b0b0b">Conversion time by dataset size</text>"""

    // recessive decade grid + axis tick labels (text ink, never series color)
    for (d <- math.ceil(x0).toInt to math.floor(x1).toInt) {
      val x = sx(math.pow(10, d))
      sb ++= f"""<line x1="$x%.1f" y1="$MT" x2="$x%.1f" y2="${H - MB}" stroke="#e8e7e2" stroke-width="1"/>"""
      sb ++= f"""<text x="$x%.1f" y="${H - MB + 18}" font-size="11" fill="#52514e" text-anchor="middle">1e$d</text>"""
    }
    for (d <- math.ceil(y0).toInt to math.floor(y1).toInt) {
      val y = sy(math.pow(10, d))
      sb ++= f"""<line x1="$ML" y1="$y%.1f" x2="${W - MR}" y2="$y%.1f" stroke="#e8e7e2" stroke-width="1"/>"""
      sb ++= f"""<text x="${ML - 8}" y="${y + 4}%.1f" font-size="11" fill="#52514e" text-anchor="end">1e$d</text>"""
    }
    sb ++= f"""<text x="${(ML + W - MR) / 2}%.1f" y="${H - 10}" font-size="12" fill="#52514e" text-anchor="middle">rows (log)</text>"""
    sb ++= f"""<text x="16" y="${(MT + H - MB) / 2}%.1f" font-size="12" fill="#52514e" text-anchor="middle" transform="rotate(-90 16 ${(MT + H - MB) / 2}%.1f)">seconds (log)</text>"""

    // series: 2px line, 8px markers with native-tooltip titles, end label
    pts.zipWithIndex.foreach { case ((m, ps), i) =>
      val color = seriesColor(i)
      if (ps.nonEmpty) {
        val path = ps.map { case (s, t) => f"${sx(s)}%.1f,${sy(t)}%.1f" }.mkString(" ")
        sb ++= s"""<polyline points="$path" fill="none" stroke="$color" stroke-width="2"/>"""
        ps.foreach { case (s, t) =>
          sb ++= f"""<circle cx="${sx(s)}%.1f" cy="${sy(t)}%.1f" r="4" fill="$color" stroke="#fcfcfb" stroke-width="2"><title>${esc(m)}: ${t}%.2f s at ${s.toLong} rows</title></circle>"""
        }
      }
    }

    // direct end labels, nudged apart so converging series stay readable
    val ends = pts.zipWithIndex.collect { case ((m, ps), i) if ps.nonEmpty =>
      (m, seriesColor(i), sy(ps.last._2))
    }.sortBy(_._3)
    val placed = ends.foldLeft(List.empty[(String, String, Double)]) {
      case (acc, (m, c, y)) =>
        val yy = acc.headOption.fold(y)(prev => math.max(y, prev._3 + 14.0))
        (m, c, yy) :: acc
    }.reverse
    placed.foreach { case (m, c, y) =>
      sb ++= f"""<circle cx="${W - MR + 14}" cy="$y%.1f" r="4" fill="$c"/>"""
      sb ++= f"""<text x="${W - MR + 22}" y="${y + 4}%.1f" font-size="12" fill="#0b0b0b">${esc(m)}</text>"""
    }

    // legend row (identity never color-alone: marker + text ink label)
    var lx = ML
    pts.zipWithIndex.foreach { case ((m, _), i) =>
      val color = seriesColor(i)
      sb ++= f"""<circle cx="$lx%.1f" cy="40" r="4" fill="$color"/>"""
      sb ++= s"""<text x="${lx + 8}" y="44" font-size="11" fill="#52514e">${esc(m)}</text>"""
      lx += 10 + 7.0 * m.length + 18
    }
    sb ++= "</svg>"

    val svg = sb.toString
    Files.createDirectories(Paths.get(outPath).getParent)
    Files.write(Paths.get(outPath), svg.getBytes("UTF-8"))
    svg
  }
}
