package graft.lake

import org.apache.spark.sql.Column

/** One WHEN clause of a general SQL MERGE, with its optional AND
  * condition already resolved (by the caller's `build` function in
  * `LakeTable.mergeInto`) against concrete target/source frames.
  * Clause order is significant: the FIRST clause whose condition holds
  * acts, like the SQL standard's WHEN evaluation order.
  */
sealed trait MergeClause { def condition: Option[Column] }

object MergeClause {
  /** WHEN MATCHED [AND cond] THEN UPDATE SET … — assignments by target
    * column name; unassigned columns keep their current value.
    */
  final case class Update(condition: Option[Column], assignments: Map[String, Column])
      extends MergeClause

  /** WHEN MATCHED [AND cond] THEN DELETE (also WHEN NOT MATCHED BY
    * SOURCE … DELETE).
    */
  final case class Delete(condition: Option[Column]) extends MergeClause

  /** WHEN NOT MATCHED [AND cond] THEN INSERT (cols) VALUES (…) —
    * unassigned columns insert NULL.
    */
  final case class Insert(condition: Option[Column], assignments: Map[String, Column])
      extends MergeClause
}

/** A fully-resolved MERGE statement body. `matched` and
  * `notMatchedBySource` may hold Update/Delete clauses; `notMatched`
  * holds Inserts.
  */
final case class MergeSpec(
    condition: Column,
    matched: Seq[MergeClause],
    notMatched: Seq[MergeClause.Insert],
    notMatchedBySource: Seq[MergeClause])
