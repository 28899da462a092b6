package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class LabelMapSpec extends AnyFunSuite {

  private val pbtxt =
    """item { name: "not pneumonia" id: 0 display_name: "background" }
      |item { name: "pneumonia" id: 1 }
      |""".stripMargin

  test("pbtxt parses the 3-field item blocks") {
    val items = LabelMap.parsePbtxt(pbtxt)
    assert(items === Seq(
      LabelMap.Item("not pneumonia", 0, Some("background")),
      LabelMap.Item("pneumonia", 1, None)))
  }

  test("validation: negative ids and non-background id 0 rejected") {
    assertThrows[IllegalArgumentException](
      LabelMap.validate(Seq(LabelMap.Item("x", -1, None))))
    assertThrows[IllegalArgumentException](
      LabelMap.validate(Seq(LabelMap.Item("cat", 0, None))))
    LabelMap.validate(LabelMap.parsePbtxt(pbtxt)) // ok via display_name
  }

  test("categories: range filter, display-name preference, first-wins dedup") {
    val items = Seq(
      LabelMap.Item("a", 1, Some("alpha")),
      LabelMap.Item("a2", 1, None), // dup id — first wins
      LabelMap.Item("b", 2, None),
      LabelMap.Item("c", 99, None)) // out of range
    assert(LabelMap.categories(items, maxNumClasses = 2) ===
      Seq(1 -> "alpha", 2 -> "b"))
    assert(LabelMap.categories(items, maxNumClasses = 2, useDisplayName = false) ===
      Seq(1 -> "a", 2 -> "b"))
  }

  test("labelMapDict fills background and interior gaps") {
    val items = Seq(LabelMap.Item("x", 1, None), LabelMap.Item("z", 4, None))
    val dict = LabelMap.labelMapDict(items, fillGapsAndBackground = true)
    assert(dict === Map("x" -> 1, "z" -> 4, "background" -> 0,
      "class_2" -> 2, "class_3" -> 3))
  }

  test("rsna index matches the reference's hard-coded table") {
    assert(LabelMap.rsnaIndex === Map(1 -> "pneumonia", 0 -> "not pneumonia"))
  }
}
