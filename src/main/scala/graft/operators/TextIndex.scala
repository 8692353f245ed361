package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted postings index materialized INTO the lakehouse catalog —
  * the text twin of [[VectorIndex]]: one row per distinct token holding
  * the sorted doc-id posting list, PARTITIONED BY a hash bucket of the
  * token. A term lookup filters `bucket = h(term) AND tok = term`, so
  * partition pruning plus per-file stats skip every other bucket's
  * FILES from metadata alone — keyword search over a 100 TB corpus
  * reads a handful of posting files, never the corpus (Lucene's term
  * dictionary+postings re-expressed as a lakehouse table; the bucket
  * column is the shard key a distributed index would route on).
  *
  * Maintenance is incremental, same contract as IVF: the covered
  * source version persists as index-table properties; a refresh merges
  * ONLY the postings of tokens appearing in appended documents (a
  * merge-on-read upsert keyed on the token — old posting files are
  * not rewritten), and rebuilds under a temp name + swap when the
  * source history holds non-append commits.
  */
object TextIndex {

  val SourceProp = "graft.postings.source"
  val VersionProp = "graft.postings.sourceVersion"
  val BucketsProp = "graft.postings.buckets"
  val TextColProp = "graft.postings.textCol"
  val IdColProp = "graft.postings.idCol"
  /** Corpus document count at the covered version — the N of idf =
    * ln(N/df). Maintained incrementally (appends add their row count);
    * rebuilds recount. */
  val NDocsProp = "graft.postings.nDocs"
  /** Total corpus token count at the covered version — avgdl =
    * sumLen / N, the BM25 length norm. Incremental like N. */
  val SumLenProp = "graft.postings.sumLen"

  private def fq(catalog: String, namespace: Seq[String], name: String): String =
    (catalog +: namespace :+ name).mkString(".")

  private def lakeTable(
      spark: SparkSession, catalog: String, namespace: Seq[String],
      name: String): graft.catalog.LakehouseTable =
    IndexSwap.lakeTable(spark, catalog, namespace, name)

  private def setProps(spark: SparkSession, table: String, props: Map[String, String]): Unit =
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES (${
      props.map { case (k, v) => s"'$k'='$v'" }.mkString(", ")})")

  /** Per-(token, doc) sorted POSITION lists of a document frame: the
    * tokenizer runs once per doc and the exchange ships each (doc,
    * token) once, positions folded into one array. Positions make the
    * index phrase-capable (Lucene's positions file as a nested array
    * column) at the cost of one long per corpus token — and they cost
    * NOTHING on membership probes, where column pruning drops them
    * before the scan. */
  private def tokenPairs(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
        size(split(col(textCol), " ")).cast("long").as("len"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .groupBy(col("tok"), col("id"))
      // max, not first: rows sharing a doc id merge into one entry,
      // and the stored len must match corpusStats' max(len) semantics
      .agg(sort_array(collect_list(col("pos").cast("long"))).as("poss"),
        max(col("len")).as("len"))

  /** Postings rows for a (tok, id, poss, len) frame: (tok, bucket,
    * docs sorted, df, poss and lens aligned with docs — positions make
    * the index phrase-capable, per-entry doc lengths are BM25's length
    * norm, Lucene's positions + norms as nested array columns). */
  private def postingsOf(pairs: DataFrame, nBuckets: Int): DataFrame =
    pairs.groupBy(col("tok"))
      // struct sort orders by the leading id field → docs ascending,
      // positions and lengths carried along in lockstep
      .agg(sort_array(collect_list(struct(col("id"), col("poss"), col("len"))))
        .as("entries"))
      .select(col("tok"),
        pmod(xxhash64(col("tok")), lit(nBuckets.toLong)).cast("int").as("bucket"),
        transform(col("entries"), e => e.getField("id")).as("docs"),
        transform(col("entries"), e => e.getField("poss")).as("poss"),
        transform(col("entries"), e => e.getField("len")).as("lens"))
      .select(col("tok"), col("bucket"), col("docs"), col("poss"), col("lens"),
        size(col("docs")).cast("long").as("df"))

  /** Build the postings table over a LAKEHOUSE source table and persist
    * the maintenance contract (source, covered version, bucket count). */
  def create(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      sourceTable: String,
      indexName: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      nBuckets: Int = 64): Unit = {
    val srcLt = lakeTable(spark, catalog, namespace, sourceTable)
    val srcVersion = graft.catalog.TableMetadata.load(srcLt.tableDir).version
    val index = fq(catalog, namespace, indexName)
    spark.sql(
      s"CREATE TABLE $index (tok STRING, docs ARRAY<BIGINT>, df BIGINT, " +
        "poss ARRAY<ARRAY<BIGINT>>, lens ARRAY<BIGINT>, bucket INT) " +
        "PARTITIONED BY (bucket)")
    postingsOf(tokenPairs(spark.table(fq(catalog, namespace, sourceTable)), textCol, idCol),
        nBuckets)
      .createOrReplaceTempView("postings_src")
    spark.sql(
      s"INSERT INTO $index SELECT tok, docs, df, poss, lens, bucket FROM postings_src")
    val (nDocs, sumLen) =
      corpusStats(spark.table(fq(catalog, namespace, sourceTable)), textCol, idCol)
    setProps(spark, index, Map(
      SourceProp -> sourceTable,
      VersionProp -> srcVersion.toString,
      BucketsProp -> nBuckets.toString,
      TextColProp -> textCol,
      IdColProp -> idCol,
      NDocsProp -> nDocs.toString,
      SumLenProp -> sumLen.toString))
  }

  /** (doc count, total token count) of a document frame — the N and
    * sumLen of the idf/BM25 stats. Counts MERGED docs, not rows: rows
    * sharing a doc id fold into one posting entry (positions unioned,
    * len maxed), so stats group by id with max(len) to stay consistent
    * with what the index stores. The single definition of token
    * counting for stats: every maintenance path and fallback must
    * agree with the oracle's len(string_split(text)). */
  private def corpusStats(docs: DataFrame, textCol: String, idCol: String): (Long, Long) = {
    val r = docs
      .select(col(idCol).cast("long").as("id"),
        size(split(col(textCol), " ")).cast("long").as("len"))
      .groupBy(col("id")).agg(max(col("len")).as("len"))
      .agg(count(lit(1)), sum(col("len"))).collect()(0)
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** The source table AT a covered version (time travel). A version
    * expired from retained history falls back to the current table —
    * slightly-off healed stats beat an unusable legacy index. */
  private def sourceAt(
      spark: SparkSession, catalog: String, namespace: Seq[String],
      sourceTable: String, version: String): DataFrame = {
    val t = fq(catalog, namespace, sourceTable)
    try spark.sql(s"SELECT * FROM $t VERSION AS OF $version")
    catch { case _: Exception => spark.table(t) }
  }

  /** The probe buckets for a term list (one tiny local job — no table
    * is scanned; the executor-side xxhash64 is the source of truth so
    * driver and data can never disagree on the bucketing). */
  private def bucketOf(spark: SparkSession, terms: Seq[String], nBuckets: Int): Seq[Int] = {
    import spark.implicits._
    terms.toDF("tok")
      .select(pmod(xxhash64(col("tok")), lit(nBuckets.toLong)).cast("int"))
      .collect().map(_.getInt(0)).toSeq.distinct
  }

  /** Documents containing EVERY term (conjunctive keyword search): the
    * scan carries `bucket IN (...) AND tok IN (...)`, so partition
    * pruning drops every unprobed bucket's files before any data is
    * read; the surviving posting rows (≤ |terms|) explode and
    * intersect by counting distinct matched terms per doc. */
  def searchAll(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      indexName: String,
      terms: Seq[String]): DataFrame = {
    // loadOrAdopt: a crash in refresh's DROP→RENAME window leaves only
    // the completed __rebuild staging — adopt it instead of failing
    val idxLt = IndexSwap.loadOrAdopt(spark, catalog, namespace, indexName, VersionProp)
    val props = graft.catalog.TableMetadata.load(idxLt.tableDir).properties
    def prop(p: String): String = props.getOrElse(p,
      throw new IllegalArgumentException(
        s"$indexName is not a postings index (no $p)"))
    val nBuckets = prop(BucketsProp).toInt
    val idCol = prop(IdColProp)
    val distinctTerms = terms.distinct
    val buckets = bucketOf(spark, distinctTerms, nBuckets)
    spark.table(fq(catalog, namespace, indexName))
      .filter(col("bucket").isin(buckets: _*) && col("tok").isin(distinctTerms: _*))
      .select(col("tok"), explode(col("docs")).as(idCol))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("nt")) // posting rows are tok-unique
      .filter(col("nt") === distinctTerms.size)
      .select(col(idCol))
      .orderBy(col(idCol))
  }

  /** Exact PHRASE search from the positional postings: documents
    * containing the terms CONSECUTIVELY, in order. The probe reads the
    * phrase terms' posting rows only (bucket+token file skipping, as
    * [[searchAll]]); each term's entry list explodes to (doc,
    * positions), terms join by doc RAREST-FIRST (the df recorded on
    * the posting row orders the join chain driver-side from ≤|terms|
    * values, so every subsequent join's left side is already the
    * smallest candidate set — Lucene's lowest-df-first conjunction),
    * and a start position survives when term i appears at start+i for
    * every i (array_contains over the aligned position arrays — row-
    * local, codegen'd). The corpus is never read. */
  def phraseSearch(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      indexName: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val idxLt = IndexSwap.loadOrAdopt(spark, catalog, namespace, indexName, VersionProp)
    val props = graft.catalog.TableMetadata.load(idxLt.tableDir).properties
    def prop(p: String): String = props.getOrElse(p,
      throw new IllegalArgumentException(
        s"$indexName is not a postings index (no $p)"))
    val nBuckets = prop(BucketsProp).toInt
    val idCol = prop(IdColProp)
    val buckets = bucketOf(spark, phrase.distinct, nBuckets)
    val postings = spark.table(fq(catalog, namespace, indexName))
      .filter(col("bucket").isin(buckets: _*) && col("tok").isin(phrase.distinct: _*))

    // ≤|terms| (term, df) rows: order the join chain rarest-first
    val dfs = postings.select(col("tok"), col("df")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a term with no posting row empties the conjunction
    if (phrase.exists(t => !dfs.contains(t)))
      return spark.range(0).select(col("id").as(idCol))
    val order = phrase.zipWithIndex.sortBy { case (t, _) => dfs(t) }

    def termFrame(t: String, i: Int): DataFrame =
      postings.filter(col("tok") === t)
        .select(explode(arrays_zip(col("docs"), col("poss"))).as("e"))
        .select(col("e.docs").as(idCol), col("e.poss").as(s"p$i"))

    val (t0, i0) = order.head
    val joined = order.tail.foldLeft(termFrame(t0, i0)) { case (acc, (t, i)) =>
      // posting-bounded sides: pin the hash build on the new term's
      // frame, never leave the choice adaptive
      acc.join(termFrame(t, i).hint("shuffle_hash"), Seq(idCol))
    }
    // a start s survives iff term i sits at s + i for every i; the
    // rarest term's positions (offset back to starts) seed the filter
    val starts = filter(
      transform(col(s"p$i0"), p => p - lit(i0.toLong)),
      s => order.tail.map { case (_, i) =>
        array_contains(col(s"p$i"), s + lit(i.toLong))
      }.foldLeft(s >= 0L)(_ && _))
    joined.filter(size(starts) > 0)
      .select(col(idCol))
      .orderBy(col(idCol))
  }

  /** Ranked retrieval from the postings alone (disjunctive): documents
    * matching ANY term, scored by the summed idf ln(N/df) of their
    * matched terms — rarer terms dominate, ubiquitous ones contribute
    * nothing, the classic tf-absent half of BM25 served without ever
    * touching the corpus. Same probe shape as [[searchAll]]: the scan
    * carries `bucket IN (...) AND tok IN (...)`, file-skips every
    * unprobed bucket, and the ranking input is ≤|terms| posting rows.
    * Scores round to 4 decimals; ties break by doc id (total order). */
  def searchRanked(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      indexName: String,
      terms: Seq[String],
      k: Int): DataFrame = {
    val idxLt = IndexSwap.loadOrAdopt(spark, catalog, namespace, indexName, VersionProp)
    val props = graft.catalog.TableMetadata.load(idxLt.tableDir).properties
    def prop(p: String): String = props.getOrElse(p,
      throw new IllegalArgumentException(
        s"$indexName is not a postings index (no $p)"))
    val nBuckets = prop(BucketsProp).toInt
    val idCol = prop(IdColProp)
    // an index built before NDocsProp existed is still a valid
    // postings index: self-heal by counting the source instead of
    // mis-diagnosing it as non-index — AT the covered version, so the
    // healed N agrees with the stored df/postings even when the source
    // has since advanced (falls back to current if history expired)
    val nDocs = props.get(NDocsProp).map(_.toLong).getOrElse(
      sourceAt(spark, catalog, namespace, prop(SourceProp), prop(VersionProp))
        .select(col(prop(IdColProp))).distinct().count())
    val distinctTerms = terms.distinct
    val buckets = bucketOf(spark, distinctTerms, nBuckets)
    spark.table(fq(catalog, namespace, indexName))
      .filter(col("bucket").isin(buckets: _*) && col("tok").isin(distinctTerms: _*))
      .select(log(lit(nDocs.toDouble) / col("df").cast("double")).as("w"),
        explode(col("docs")).as(idCol))
      .groupBy(col(idCol))
      .agg(round(sum(col("w")), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Full BM25 top-k from the postings alone (disjunctive): per
    * matched (term, doc) the posting entry carries tf = |positions|
    * and the doc length norm, so the classic Robertson BM25
    *   idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl))
    * with idf(t) = ln(1 + (N − df + ½)/(df + ½)) computes row-locally
    * from ≤|terms| posting rows — the corpus is never read, exactly
    * Lucene's postings+norms evaluation as a lakehouse scan. Scores
    * round to 4 decimals; ties break by doc id. */
  def searchBM25(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      indexName: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val idxLt = IndexSwap.loadOrAdopt(spark, catalog, namespace, indexName, VersionProp)
    val props = graft.catalog.TableMetadata.load(idxLt.tableDir).properties
    def prop(p: String): String = props.getOrElse(p,
      throw new IllegalArgumentException(
        s"$indexName is not a postings index (no $p)"))
    val nBuckets = prop(BucketsProp).toInt
    val idCol = prop(IdColProp)
    // a pre-stats index self-heals by recounting the source once — at
    // the covered version, so healed N/avgdl agree with the stored
    // df/postings even when the source has since advanced
    val (nDocs, sumLen) = (props.get(NDocsProp), props.get(SumLenProp)) match {
      case (Some(n), Some(sl)) => (n.toLong, sl.toLong)
      case _ => corpusStats(
        sourceAt(spark, catalog, namespace, prop(SourceProp), prop(VersionProp)),
        prop(TextColProp), prop(IdColProp))
    }
    val avgdl = sumLen.toDouble / nDocs.toDouble
    val distinctTerms = terms.distinct
    val buckets = bucketOf(spark, distinctTerms, nBuckets)
    spark.table(fq(catalog, namespace, indexName))
      .filter(col("bucket").isin(buckets: _*) && col("tok").isin(distinctTerms: _*))
      .select(
        log(lit(1.0) +
          (lit(nDocs.toDouble) - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))).as("idf"),
        explode(arrays_zip(col("docs"), col("poss"), col("lens"))).as("e"))
      .select(col("e.docs").as(idCol),
        (col("idf") * ((size(col("e.poss")).cast("double") * lit(k1 + 1.0)) /
          (size(col("e.poss")).cast("double") +
            lit(k1) * ((lit(1.0) - lit(b)) +
              (lit(b) * col("e.lens").cast("double")) / lit(avgdl))))).as("w"))
      .groupBy(col(idCol))
      .agg(round(sum(col("w")), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Fold source commits since the last refresh into the index.
    * Returns "noop", "incremental" (append windows upsert only the
    * postings of tokens seen in appended docs; row-level windows —
    * MoR delete/upsert, UPDATE, MERGE — fold through the changelog via
    * [[rowLevelRefresh]], touching only the affected tokens' postings
    * either way), or "full" (a window the changelog cannot derive
    * row-level — expired history, schema DDL inside it — rebuilt
    * under a temp name, then swapped). */
  def refresh(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      indexName: String): String = {
    val idxLt = IndexSwap.loadOrAdopt(spark, catalog, namespace, indexName, VersionProp)
    val props = graft.catalog.TableMetadata.load(idxLt.tableDir).properties
    def prop(p: String): String = props.getOrElse(p,
      throw new IllegalArgumentException(
        s"$indexName is not a postings index (no $p — not created via TextIndex.create?)"))
    val sourceTable = prop(SourceProp)
    val lastVersion = prop(VersionProp).toInt
    val nBuckets = prop(BucketsProp).toInt
    val (textCol, idCol) = (prop(TextColProp), prop(IdColProp))
    val index = fq(catalog, namespace, indexName)

    val srcLt = lakeTable(spark, catalog, namespace, sourceTable)
    val srcVersion = graft.catalog.TableMetadata.load(srcLt.tableDir).version
    if (srcVersion == lastVersion) return "noop"

    val delta =
      try Some(graft.catalog.Maintenance.changesBetween(
        spark, catalog, namespace, sourceTable, lastVersion, srcVersion))
      catch {
        // deletes/rewrites in the window: an added-file delta cannot
        // retract doc ids from postings — rebuild from current
        case _: IllegalArgumentException => None
      }
    // an index created before the positional schema has no poss/lens
    // arrays to merge a delta into: one full rebuild migrates it
    val positional = {
      val cols = spark.table(index).columns.toSet
      cols.contains("poss") && cols.contains("lens")
    }
    delta match {
      case Some(d) if positional =>
        // idf's N and avgdl's sumLen advance only by doc ids genuinely
        // NEW to the covered version: a delta row re-using an indexed
        // id MERGES into the existing entry (positions unioned, len
        // maxed), so blindly adding its row count / length would double
        // count. Fast path (the normal append: all ids fresh) charges
        // one aggregation over the delta plus an id-column-only
        // anti-probe of the prior version; any detected reuse recounts
        // the source once with the same merge semantics. An index
        // created before the stat props recounts too, self-heals.
        val (newN, newSumLen) = (props.get(NDocsProp), props.get(SumLenProp)) match {
          case (Some(n), Some(sl)) =>
            val priorIds = sourceAt(spark, catalog, namespace, sourceTable,
                lastVersion.toString)
              .select(col(idCol).cast("long").as("id")).distinct()
            val deltaDocs = d
              .select(col(idCol).cast("long").as("id"),
                size(split(col(textCol), " ")).cast("long").as("len"))
            val r = deltaDocs
              .join(priorIds.withColumn("prior", lit(1)), Seq("id"), "left")
              .agg(count(lit(1)).as("rows"),
                countDistinct(col("id")).as("ids"),
                sum(when(col("prior").isNull, col("len"))).as("freshLen"),
                countDistinct(when(col("prior").isNull, col("id"))).as("freshIds"))
              .collect()(0)
            val (rows, ids, freshIds) = (r.getLong(0), r.getLong(1), r.getLong(3))
            if (rows == ids && ids == freshIds)
              (n.toLong + rows, sl.toLong + (if (r.isNullAt(2)) 0L else r.getLong(2)))
            else corpusStats(spark.table(fq(catalog, namespace, sourceTable)),
              textCol, idCol)
          case _ => corpusStats(spark.table(fq(catalog, namespace, sourceTable)),
            textCol, idCol)
        }
        val statProps = Map(
          VersionProp -> srcVersion.toString,
          NDocsProp -> newN.toString,
          SumLenProp -> newSumLen.toString)
        val deltaPairs = tokenPairs(d, textCol, idCol)
        if (deltaPairs.isEmpty) {
          setProps(spark, index, statProps)
          return "incremental"
        }
        // affected postings only: current rows for the delta's tokens,
        // doc lists unioned, then ONE merge-on-read upsert keyed on tok —
        // write cost ∝ |affected tokens|, never |index|. The bucket
        // IN-list is what actually file-skips: a broadcast join on the
        // data column `tok` pushes nothing into the scan, so without it
        // a small append read EVERY posting file of the bucket-clustered
        // index (rowLevelRefresh below uses the same pattern)
        val affected = deltaPairs.select(col("tok")).distinct()
        val bucketsHit = affected
          .select(pmod(xxhash64(col("tok")), lit(nBuckets.toLong)).cast("int").as("b"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val current = spark.table(index)
          .filter(col("bucket").isin(bucketsHit: _*))
          .join(broadcast(affected), Seq("tok"))
          .select(col("tok"),
            explode(arrays_zip(col("docs"), col("poss"), col("lens"))).as("e"))
          .select(col("tok"), col("e.docs").as("id"), col("e.poss").as("poss"),
            col("e.lens").as("len"))
        // idempotent re-merge: a crash between the upsert and the
        // version-property commit replays the same delta against a
        // current that already contains it — positions set-union per
        // (tok, doc), so the replay is a no-op and a re-used doc id
        // merges into one entry instead of duplicating (df, search
        // counts, and BM25 weights would all corrupt otherwise)
        val mergedPairs = current
          .unionByName(deltaPairs.select(col("tok"), col("id"), col("poss"), col("len")))
          .groupBy(col("tok"), col("id"))
          .agg(sort_array(array_distinct(flatten(collect_list(col("poss"))))).as("poss"),
            max(col("len")).as("len"))
        val merged = postingsOf(mergedPairs, nBuckets)
        graft.catalog.MergeOnRead.morUpsert(spark, catalog, namespace, indexName,
          merged.select(col("tok"), col("docs"), col("df"), col("poss"), col("lens"),
            col("bucket")),
          Seq("tok"))
        setProps(spark, index, statProps)
        "incremental"
      case _ if positional && rowLevelRefresh(spark, catalog, namespace, indexName,
          sourceTable, lastVersion, srcVersion, nBuckets, textCol, idCol, props) =>
        "incremental"
      case _ =>
        val tmpName = indexName + "__rebuild"
        val tmpFq = fq(catalog, namespace, tmpName)
        spark.sql(s"DROP TABLE IF EXISTS $tmpFq")
        create(spark, catalog, namespace, sourceTable, tmpName,
          textCol, idCol, nBuckets)
        spark.sql(s"DROP TABLE $index")
        spark.sql(s"ALTER TABLE $tmpFq RENAME TO ${(namespace :+ indexName).mkString(".")}")
        "full"
    }
  }

  /** Fold a ROW-LEVEL source window (MoR delete / upsert, UPDATE,
    * MERGE — the standing-corpus workflow: dedup removals, PII scrubs)
    * into the index without a rebuild. The changelog names the changed
    * doc ids; the current source supplies their surviving state; and
    * only the postings of tokens on either side of the change are
    * touched — removed-doc tokens (from the changelog's delete rows)
    * plus surviving-doc tokens. Affected entries are re-derived as
    *   kept  = current postings of affected tokens MINUS changed ids
    *   fresh = tokenized current state of changed ids
    * and written back as ONE merge-on-read upsert keyed on tok, with
    * tokens whose last doc vanished equality-deleted (a df=0 posting
    * row would corrupt idf) — Lucene's delete-tombstone fold expressed
    * through the engine's own MoR machinery. Write cost ∝ |affected
    * tokens|; read cost ∝ changelog-touched files plus the id-filtered
    * probes of the prior and current source versions (for the N /
    * sumLen delta) — never ∝ |index| or |corpus|. Replay-safe: a crash
    * before the version-property commit re-derives the same window
    * against the merged index and converges to the same entries.
    * Returns false when the window cannot be derived row-level
    * (expired history, schema DDL inside it) — caller falls back to
    * rebuild+swap. */
  private def rowLevelRefresh(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      indexName: String,
      sourceTable: String,
      lastVersion: Int,
      srcVersion: Int,
      nBuckets: Int,
      textCol: String,
      idCol: String,
      props: Map[String, String]): Boolean = {
    val index = fq(catalog, namespace, indexName)
    val srcT = fq(catalog, namespace, sourceTable)
    val cl =
      try graft.catalog.Maintenance.changelogBetween(
        spark, catalog, namespace, sourceTable, lastVersion, srcVersion)
      catch { case _: IllegalArgumentException => return false }
    // the stat delta subtracts the changed ids' PRIOR contribution — a
    // silent fall-back-to-current (sourceAt's lenient contract) would
    // cancel the subtraction and drift N; demand strict time travel
    val priorDf =
      try spark.sql(s"SELECT * FROM $srcT VERSION AS OF $lastVersion")
      catch { case _: Exception => return false }

    val changed = cl.select(col(idCol).cast("long").as("id")).distinct()
    if (changed.isEmpty) {
      // metadata-only or self-cancelling window (compaction): postings
      // and stats are already right, only the covered version advances
      setProps(spark, index, Map(VersionProp -> srcVersion.toString))
      return true
    }
    // the surviving state of every changed id, straight from the
    // merging read of the current source (duplicate-id rows merge in
    // tokenPairs exactly as a rebuild would)
    def changedOnly(df: DataFrame): DataFrame =
      df.withColumn("__gid", col(idCol).cast("long"))
        .join(changed.withColumnRenamed("id", "__gid").hint("shuffle_hash"),
          Seq("__gid"), "left_semi")
        .drop("__gid")
    val newDocs = changedOnly(spark.table(srcT))
    val (nDocs, sumLen) = (props.get(NDocsProp), props.get(SumLenProp)) match {
      case (Some(n), Some(sl)) =>
        val (oldCnt, oldLen) = corpusStats(changedOnly(priorDf), textCol, idCol)
        val (newCnt, newLen) = corpusStats(newDocs, textCol, idCol)
        (n.toLong - oldCnt + newCnt, sl.toLong - oldLen + newLen)
      case _ => corpusStats(spark.table(srcT), textCol, idCol)
    }

    val newPairs = tokenPairs(newDocs, textCol, idCol)
    // affected = tokens the change could touch: every token of a
    // removed/updated row's OLD text (the changelog delete rows carry
    // it) plus every token of the changed ids' surviving text
    val oldToks = cl.filter(col("_change_type") === lit("delete"))
      .select(explode(split(col(textCol), " ")).as("tok")).distinct()
    val affected = oldToks.union(newPairs.select(col("tok"))).distinct()
    // bucket pruning before the tok join: ≤ nBuckets driver values, so
    // a small window file-skips most of the index up front; a corpus-
    // wide scrub degenerates to all buckets and still never broadcasts
    // the (possibly huge) affected-token set — the join is pinned
    // shuffle-hash with the token list as build
    val bucketsHit = affected
      .select(pmod(xxhash64(col("tok")), lit(nBuckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val kept = spark.table(index)
      .filter(col("bucket").isin(bucketsHit: _*))
      .join(affected.hint("shuffle_hash"), Seq("tok"))
      .select(col("tok"),
        explode(arrays_zip(col("docs"), col("poss"), col("lens"))).as("e"))
      .select(col("tok"), col("e.docs").as("id"), col("e.poss").as("poss"),
        col("e.lens").as("len"))
      .join(changed.hint("shuffle_hash"), Seq("id"), "left_anti")
    val merged = postingsOf(
      kept.unionByName(newPairs.select(col("tok"), col("id"), col("poss"), col("len"))),
      nBuckets)

    // a token whose every doc vanished must LEAVE the index: delete
    // first, then upsert — a replay of either half is a no-op
    val vanished = affected.join(merged.select(col("tok")), Seq("tok"), "left_anti")
    if (!vanished.isEmpty)
      graft.catalog.MergeOnRead.morDelete(spark, catalog, namespace, indexName, vanished)
    if (!merged.isEmpty)
      graft.catalog.MergeOnRead.morUpsert(spark, catalog, namespace, indexName,
        merged.select(col("tok"), col("docs"), col("df"), col("poss"), col("lens"),
          col("bucket")),
        Seq("tok"))
    setProps(spark, index, Map(
      VersionProp -> srcVersion.toString,
      NDocsProp -> nDocs.toString,
      SumLenProp -> sumLen.toString))
    true
  }
}
