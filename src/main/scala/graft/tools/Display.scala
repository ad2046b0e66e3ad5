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

  def get(name: String): Long = name match {
    case "TABLE_PREVIEW_SIZE_SHELL" => tablePreviewSizeShell.toLong
    case "TABLE_PREVIEW_SIZE_HTML" => tablePreviewSizeHtml.toLong
    case "LIST_PREVIEW_SIZE" => listPreviewSize.toLong
    case "MAX_AUTO_COUNT" => maxAutoCount.toLong
    case other =>
      throw new graft.types.NameError(s"unknown setting '$other'")
  }
}
