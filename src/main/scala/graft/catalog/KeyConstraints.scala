package graft.catalog

import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.constraints.Constraint
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.types.StructType

/** Informational PRIMARY KEY / UNIQUE / FOREIGN KEY constraints —
  * stored NOT ENFORCED (the engine never validates them at write time;
  * CHECK is the enforced surface, [[CheckConstraints]]) and reported
  * back through the DSv2 `Table.constraints()` face, where the
  * optimizer's RELY-aware rules (join elimination, distinct removal)
  * can use them. The standard warehouse contract: declared intent,
  * writer-guaranteed, engine-propagated.
  *
  * Properties: `graft.pk.<name>` / `graft.unique.<name>` hold
  * `cols|rely`; `graft.fk.<name>` holds `cols|refTable|refCols|rely`.
  * ENFORCED declarations are refused loudly — accepting one would
  * promise a uniqueness check the write path does not run.
  */
object KeyConstraints {
  val PkPrefix = "graft.pk."
  val UniquePrefix = "graft.unique."
  val FkPrefix = "graft.fk."
  val Prefixes: Seq[String] = Seq(PkPrefix, UniquePrefix, FkPrefix)

  private def refs(cols: String): Array[NamedReference] =
    cols.split(',').map(Expressions.column)

  private def colNames(rs: Array[NamedReference]): String =
    rs.map(_.fieldNames.mkString(".")).mkString(",")

  /** Encode a non-CHECK constraint into its (property key, value), or
    * None when it is not a key constraint. Refuses ENFORCED. */
  def encode(c: Constraint): Option[(String, String)] = {
    import org.apache.spark.sql.connector.catalog.constraints.{ForeignKey, PrimaryKey, Unique}
    def requireNotEnforced(): Unit =
      if (c.enforced()) throw new UnsupportedOperationException(
        s"${c.name}: PRIMARY KEY/UNIQUE/FOREIGN KEY constraints are informational " +
          "— declare them NOT ENFORCED (the engine does not validate them on write)")
    c match {
      case pk: PrimaryKey =>
        requireNotEnforced()
        Some(PkPrefix + pk.name -> s"${colNames(pk.columns)}|${pk.rely()}")
      case u: Unique =>
        requireNotEnforced()
        Some(UniquePrefix + u.name -> s"${colNames(u.columns)}|${u.rely()}")
      case fk: ForeignKey =>
        requireNotEnforced()
        val ref = (fk.referencedTable.namespace :+ fk.referencedTable.name).mkString(".")
        Some(FkPrefix + fk.name ->
          s"${colNames(fk.columns)}|$ref|${colNames(fk.referencedColumns)}|${fk.rely()}")
      case _ => None
    }
  }

  /** Rebuild the declared key constraints for Table.constraints():
    * NOT ENFORCED, UNVALIDATED (the engine never checked the rows),
    * RELY as declared. */
  def constraintsOf(props: Map[String, String]): Seq[Constraint] = {
    val unvalidated = Constraint.ValidationStatus.UNVALIDATED
    props.toSeq.sortBy(_._1).flatMap {
      case (k, v) if k.startsWith(PkPrefix) =>
        val Array(cols, rely) = v.split('|')
        Some(Constraint.primaryKey(k.drop(PkPrefix.length), refs(cols))
          .enforced(false).validationStatus(unvalidated).rely(rely.toBoolean)
          .build(): Constraint)
      case (k, v) if k.startsWith(UniquePrefix) =>
        val Array(cols, rely) = v.split('|')
        Some(Constraint.unique(k.drop(UniquePrefix.length), refs(cols))
          .enforced(false).validationStatus(unvalidated).rely(rely.toBoolean)
          .build(): Constraint)
      case (k, v) if k.startsWith(FkPrefix) =>
        val Array(cols, ref, rcols, rely) = v.split('|')
        val parts = ref.split('.')
        Some(Constraint.foreignKey(k.drop(FkPrefix.length), refs(cols),
            Identifier.of(parts.dropRight(1), parts.last), refs(rcols))
          .enforced(false).validationStatus(unvalidated).rely(rely.toBoolean)
          .build(): Constraint)
      case _ => None
    }
  }

  /** RELY'd uniqueness claims: (column set, isPrimaryKey) for every
    * PK/UNIQUE constraint declared with RELY. The optimizer trusts
    * these ([[ConstraintOptimization]]); rely=false declarations are
    * documentation only and never drive a rewrite. */
  def relyUniqueKeys(props: Map[String, String]): Seq[(Seq[String], Boolean)] =
    props.toSeq.sortBy(_._1).flatMap {
      case (k, v) if k.startsWith(PkPrefix) =>
        val Array(cols, rely) = v.split('|')
        if (rely.toBoolean) Some((cols.split(',').toSeq, true)) else None
      case (k, v) if k.startsWith(UniquePrefix) =>
        val Array(cols, rely) = v.split('|')
        if (rely.toBoolean) Some((cols.split(',').toSeq, false)) else None
      case _ => None
    }

  /** RELY'd referential claims: (local cols, referenced table parts,
    * referenced cols) for every FOREIGN KEY declared with RELY, local
    * and referenced columns in declaration order (position i of the
    * local key references position i of the referenced key). */
  def relyForeignKeys(props: Map[String, String]): Seq[(Seq[String], Seq[String], Seq[String])] =
    props.toSeq.sortBy(_._1).flatMap {
      case (k, v) if k.startsWith(FkPrefix) =>
        val Array(cols, ref, rcols, rely) = v.split('|')
        if (rely.toBoolean)
          Some((cols.split(',').toSeq, ref.split('.').toSeq, rcols.split(',').toSeq))
        else None
      case _ => None
    }

  /** Names (lowercased) of every declared key constraint — duplicate
    * refusal spans CHECK and key constraints together. */
  def namesOf(props: Map[String, String]): Seq[String] =
    props.keys.collect {
      case k if Prefixes.exists(k.startsWith) =>
        Prefixes.find(k.startsWith).map(p => k.drop(p.length)).get.toLowerCase
    }.toSeq

  /** Declaration-time validation: every LOCAL column named by a key
    * constraint must exist in the schema (the referenced table of an
    * FK is informational and may live in another catalog). Runs at
    * CREATE and after every ALTER — a DROP COLUMN cannot orphan one. */
  def validate(schema: StructType, props: Map[String, String]): Unit = {
    def checkCols(name: String, cols: String): Unit =
      cols.split(',').foreach { c =>
        require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
          s"key constraint '$name' references missing column '$c'")
      }
    props.foreach {
      case (k, v) if k.startsWith(PkPrefix) =>
        checkCols(k.drop(PkPrefix.length), v.split('|')(0))
      case (k, v) if k.startsWith(UniquePrefix) =>
        checkCols(k.drop(UniquePrefix.length), v.split('|')(0))
      case (k, v) if k.startsWith(FkPrefix) =>
        checkCols(k.drop(FkPrefix.length), v.split('|')(0))
      case _ =>
    }
  }
}
