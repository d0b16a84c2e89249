package graft.operators

import org.apache.spark.sql.DataFrame

/** Collision-safe helper-column names. Operators that add scratch
  * columns (`row_number` ranks, change-detection keys, …) must not
  * silently overwrite a caller's column of the same name, so names are
  * suffixed until free in the input frame.
  */
object TempCol {
  def apply(base: String, df: DataFrame): String = {
    val existing = df.columns.toSet
    Iterator.from(0)
      .map(i => if (i == 0) s"__graft_$base" else s"__graft_${base}_$i")
      .dropWhile(existing.contains)
      .next()
  }
}
