package graft.tools

/** Runtime display settings, mutable from the language via
  * `set_setting(name, value)` — mirror of the reference's
  * `settings.Display` (settings.py:27-31, pql_functions.py:210-216).
  * Names match the reference exactly so its scripts run unchanged.
  */
object Display {
  @volatile var tablePreviewSizeShell: Int = 16
  @volatile var tablePreviewSizeHtml: Int = 64
  @volatile var listPreviewSize: Int = 128
  @volatile var maxAutoCount: Int = 10000

  def set(name: String, value: Long): Unit = {
    if (value < 1 || value > Int.MaxValue)
      throw new graft.types.ValueError(
        s"setting '$name' must be a positive int, got $value")
    name match {
    case "TABLE_PREVIEW_SIZE_SHELL" => tablePreviewSizeShell = value.toInt
    case "TABLE_PREVIEW_SIZE_HTML" => tablePreviewSizeHtml = value.toInt
    case "LIST_PREVIEW_SIZE" => listPreviewSize = value.toInt
    case "MAX_AUTO_COUNT" => maxAutoCount = value.toInt
    case other =>
      throw new graft.types.NameError(s"unknown setting '$other'")
    }
  }

  /** Reference-style table rendering (display.py:118-153 _rich_table,
    * rendered as plain text): a `table <name> =<count>` title line,
    * a box-drawn grid with column-name headers, numeric columns
    * right-justified, nulls shown as `-`, and a `...` row when the
    * preview truncates. Empty results render the title line alone,
    * exactly like the reference's no-rows branch.
    *
    * `columns` carries (name, isNumeric); `rows` carries the
    * stringified cells (None = SQL null).
    */
  def renderTable(name: String, countStr: String,
                  columns: Seq[(String, Boolean)],
                  rows: Seq[Seq[Option[String]]],
                  hasMore: Boolean): String = {
    val title = (if (name != null && name.nonEmpty) s"table $name"
                 else "table") + s" $countStr"
    if (rows.isEmpty && !hasMore) return title
    val body = rows.map(_.map(_.getOrElse("-"))) ++
      (if (hasMore) Seq(columns.map(_ => "...")) else Nil)
    val widths = columns.zipWithIndex.map { case ((h, _), i) =>
      (h.length +: body.map(_(i).length)).max
    }
    def pad(s: String, i: Int): String =
      if (columns(i)._2) (" " * (widths(i) - s.length)) + s
      else s + (" " * (widths(i) - s.length))
    def rule(l: String, m: String, r: String): String =
      widths.map("─" * _).mkString(s"$l─", s"─$m─", s"─$r")
    val header = columns.map(_._1).zipWithIndex
      .map { case (h, i) => pad(h, i) }.mkString("│ ", " │ ", " │")
    val lines = body.map(r => r.zipWithIndex
      .map { case (c, i) => pad(c, i) }.mkString("│ ", " │ ", " │"))
    (Seq(title, rule("┌", "┬", "┐"), header, rule("├", "┼", "┤")) ++
      lines :+ rule("└", "┴", "┘")).mkString("\n")
  }

  def get(name: String): Long = name match {
    case "TABLE_PREVIEW_SIZE_SHELL" => tablePreviewSizeShell.toLong
    case "TABLE_PREVIEW_SIZE_HTML" => tablePreviewSizeHtml.toLong
    case "LIST_PREVIEW_SIZE" => listPreviewSize.toLong
    case "MAX_AUTO_COUNT" => maxAutoCount.toLong
    case other =>
      throw new graft.types.NameError(s"unknown setting '$other'")
  }
}
