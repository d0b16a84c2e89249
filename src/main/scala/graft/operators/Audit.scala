package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit across a star schema.
  *
  * The reference asserts row-count contracts per load
  * (valid+invalid == read, catalog row counts); the FK edges of its
  * constellation are only enforced implicitly by the load order. This
  * operator measures them: per relationship, how many fact rows carry
  * a NULL FK and how many carry a key the dimension does not have
  * (orphans) — the audit every warehouse runs after an out-of-order
  * or partial load.
  *
  * Scale shape: per edge ONE join (dim side deduped to its key —
  * broadcast while small, co-keyed shuffle at scale) collapsing into
  * a 1-row aggregate (map-side partials; the single-partition
  * exchange moves one row per task). No collect, no count() actions —
  * the result is a lazy 1-row frame per edge, unioned.
  */
object Audit {

  /** One audit row for the edge `fact.fk -> dim.dimKey`. */
  def fkIntegrity(fact: DataFrame, fk: String, dim: DataFrame, dimKey: String,
                  relationship: String): DataFrame = {
    val d = dim.select(col(dimKey).as("__dk")).distinct()
    fact.select(col(fk).as("__fk"))
      .join(d, col("__fk") === col("__dk"), "left")
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("__fk").isNull, 1)).as("n_null_fk"),
        count(when(col("__fk").isNotNull && col("__dk").isNull, 1)).as("n_orphans"))
      .select(lit(relationship).as("relationship"),
        col("n_rows"), col("n_null_fk"), col("n_orphans"),
        (lit(100.0) * col("n_orphans") / col("n_rows")).as("orphan_pct"))
  }

  /** Audit a set of edges: (fact, fk, dim, dimKey, name) per edge. */
  def fkIntegrityAll(edges: Seq[(DataFrame, String, DataFrame, String, String)]): DataFrame =
    edges.map { case (f, fk, d, dk, n) => fkIntegrity(f, fk, d, dk, n) }
      .reduce(_ unionByName _)
}
