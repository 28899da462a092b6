package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Category dimension table (SURVEY §2.1 S9, §2.3 J4/J5; label_map_util.py).
  *
  * A label map is tiny (2 rows in the reference, label_map_util.py:50) —
  * parsed driver-side and broadcast; as a DataFrame it broadcast-joins
  * against fact tables. The pbtxt grammar is the 3-field `item { name, id,
  * display_name }` block of string_int_label_map_pb2.py:37, parsed directly
  * (no protobuf dep offline).
  */
object LabelMap {

  final case class Item(name: String, id: Int, displayName: Option[String])

  /** The reference's live category index (label_map_util.py:50). */
  val rsnaIndex: Map[Int, String] = Map(1 -> "pneumonia", 0 -> "not pneumonia")

  private val itemRe = """(?s)item\s*\{(.*?)\}""".r
  private val fieldRe = """(name|display_name|id)\s*:\s*(?:"([^"]*)"|(-?\d+))""".r

  /** Parse protobuf-text label map (label_map_util.py:113-128's happy path). */
  def parsePbtxt(text: String): Seq[Item] =
    itemRe.findAllMatchIn(text).map { m =>
      var name = ""; var id = -1; var display: Option[String] = None
      fieldRe.findAllMatchIn(m.group(1)).foreach { f =>
        f.group(1) match {
          case "name" => name = f.group(2)
          case "display_name" => display = Some(f.group(2))
          case "id" => id = f.group(3).toInt
        }
      }
      Item(name, id, display)
    }.toSeq

  /** label_map_util.py:24-36: ids >= 0; id 0 reserved for background. */
  def validate(items: Seq[Item]): Unit = {
    items.foreach { it =>
      require(it.id >= 0, "Label map ids should be >= 0.")
      require(
        it.id != 0 || it.name == "background" || it.displayName.contains("background"),
        "Label map id 0 is reserved for the background label")
    }
  }

  /** convert_label_map_to_categories (:64-110): range filter, display-name
    * preference, first-wins dedup. */
  def categories(items: Seq[Item], maxNumClasses: Int,
      useDisplayName: Boolean = true): Seq[(Int, String)] = {
    val seen = collection.mutable.LinkedHashMap.empty[Int, String]
    items.foreach { it =>
      if (0 < it.id && it.id <= maxNumClasses && !seen.contains(it.id)) {
        val name =
          if (useDisplayName && it.displayName.isDefined) it.displayName.get else it.name
        seen(it.id) = name
      }
    }
    seen.toSeq
  }

  /** get_label_map_dict with fill_in_gaps_and_background (:131-172):
    * name→id, background 0 added, interior gaps filled as class_N. */
  def labelMapDict(items: Seq[Item], fillGapsAndBackground: Boolean = false): Map[String, Int] = {
    validate(items)
    var dict = items.map(it => it.name -> it.id).toMap
    if (fillGapsAndBackground) {
      val values = dict.values.toSet
      if (!values.contains(0)) dict += "background" -> 0
      val withBg = dict.values.toSet
      require(withBg.forall(_ >= 0), "The values in the label map must be positive.")
      if (withBg.size != withBg.max + 1)
        (1 until withBg.max).foreach { v =>
          if (!withBg.contains(v)) dict += s"class_$v" -> v
        }
    }
    dict
  }

  def maxIndex(items: Seq[Item]): Int = items.map(_.id).max

  /** The dimension as a 2-column DataFrame for broadcast joins (J4). */
  def toDataFrame(spark: SparkSession, index: Map[Int, String]): DataFrame = {
    import spark.implicits._
    index.toSeq.toDF("category_id", "category_name")
  }
}
