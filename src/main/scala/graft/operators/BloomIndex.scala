package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.sketch.BloomFilter

/** Per-file BLOOM FILTER sidecars for point-lookup file skipping —
  * the piece manifest min/max cannot deliver. On a high-cardinality
  * UNORDERED key (uuid, doc_id), every segment's [min, max] window
  * spans essentially the whole key space, so an equality lookup keeps
  * every file and a needle query on a 100 TB table becomes a
  * million-split scan. A per-file bloom answers "could this file
  * contain k?" with false-positive-only error: a `=`/`IN` plan opens
  * the one file that really holds the key plus an fpp-bounded handful
  * of false positives. (Public precedent: Delta's BLOOMFILTER INDEX
  * and parquet's own column bloom filters — ours lives at FILE
  * granularity in the lake metadata, so planning skips files without
  * opening any footer.)
  *
  * Layout: one sidecar parquet dir per harvest,
  * `<table>/bloom/<uuid>`, rows `(file, col, bloom)` — the serialized
  * [[BloomFilter]] sketch per (data file, indexed column). Each
  * manifest line of a covered file carries `bloom=bloom/<uuid>` (the
  * same ride-the-line discipline as `dv=` refs), so the index is
  * committed atomically with the file list, survives carried lines
  * verbatim, and unreferenced sidecars are VACUUM-swept like DV dirs.
  *
  * Declaration rides table meta ([[MetaKey]], `fpp:col1,col2`):
  * commits harvest blooms for their FRESH files only (one distributed
  * pass over bytes just written); [[Versioned.declareBloomIndex]]
  * backfills existing segments. Consultation is ref-driven — a line
  * with a ref is prunable whether or not the declaration still rides.
  *
  * Soundness: pruning drops a file ONLY on a definitive
  * `mightContain = false` for every candidate value of an equality
  * conjunct. Missing sidecar, missing (file, col) row, unreadable
  * bytes, unsupported type — all keep the file.
  */
object BloomIndex {

  /** Meta key declaring the indexed columns: `<fpp>:<col1>,<col2>`. */
  private[graft] val MetaKey = "bloomcols"

  /** Indexable types: the point-lookup keys. Time columns are served
    * by min/max (append-only tables cluster on time); floats have no
    * sane equality semantics for lookups. */
  private[operators] def indexable(dt: org.apache.spark.sql.types.DataType)
      : Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType | ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
  }

  private[graft] def encodeMeta(cols: Seq[String], fpp: Double): (String, String) = {
    cols.foreach(ColumnMapping.validateName)
    require(fpp > 0 && fpp < 1, s"fpp out of range: $fpp")
    MetaKey -> s"$fpp:${cols.mkString(",")}"
  }

  /** The declared (columns, fpp), if any rides `meta`. */
  private[graft] def declared(meta: Map[String, String])
      : Option[(Seq[String], Double)] =
    meta.get(MetaKey).flatMap { v =>
      v.split(":", 2) match {
        case Array(f, cs) =>
          scala.util.Try(f.toDouble).toOption.filter(p => p > 0 && p < 1)
            .map(_ -> cs.split(',').toSeq.filter(_.nonEmpty))
            .collect { case (p, cols) if cols.nonEmpty => (cols, p) }
        case _ => None
      }
    }

  // --------------------------------------------------------------- harvest

  /** Canonical value insertion: integrals as long, strings as UTF-8 —
    * the SAME canon [[mightContainValue]] uses on catalyst-internal
    * filter literals, so harvest and consult can never disagree. */
  private def put(bf: BloomFilter, v: Any): Unit = v match {
    case null => ()
    case s: String => bf.putString(s)
    case b: java.lang.Byte => bf.putLong(b.longValue)
    case s: java.lang.Short => bf.putLong(s.longValue)
    case i: java.lang.Integer => bf.putLong(i.longValue)
    case l: java.lang.Long => bf.putLong(l.longValue)
    case _ => ()
  }

  private def mightContainValue(bf: BloomFilter, v: Any): Boolean = v match {
    case null => true // IS NULL is a null-count question, not a bloom one
    case s: String => bf.mightContainString(s)
    case u: org.apache.spark.unsafe.types.UTF8String =>
      bf.mightContainString(u.toString)
    case b: java.lang.Byte => bf.mightContainLong(b.longValue)
    case s: java.lang.Short => bf.mightContainLong(s.longValue)
    case i: java.lang.Integer => bf.mightContainLong(i.longValue)
    case l: java.lang.Long => bf.mightContainLong(l.longValue)
    case _ => true // unsupported literal shape: never prune
  }

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  private def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  /** Build per-(file, col) blooms for freshly written data files and
    * write them as ONE sidecar parquet dir `bloom/<uuid>`. Returns the
    * sidecar rel path, or None when nothing was indexable. One
    * distributed pass over the new files; each filter is sized by its
    * file's actual row count (from the stats harvest of the same
    * commit), so merged partial filters agree on parameters. The
    * merged filters are written as parquet STRAIGHT from the reduce —
    * no driver collect, no single-file coalesce — so a million-file
    * backfill chunk neither materializes O(files × bloom-bytes) on
    * the driver nor funnels through one writer task. Failure is
    * contained: a commit must never die on its INDEX — it just lands
    * without refs (unprunable, correct). */
  private[operators] def harvest(spark: SparkSession, root: Path,
      relFiles: Seq[String], rowsByRel: Map[String, Long],
      cols: Seq[String], fpp: Double): Option[String] =
    try {
      import org.apache.spark.sql.functions.col
      val absByRel = relFiles.map(r => r -> new Path(root, r).toString).toMap
      val df0 = spark.read.parquet(absByRel.values.toSeq: _*)
      val present = cols.filter(c => df0.schema.fields.exists(f =>
        f.name.equalsIgnoreCase(c) && indexable(f.dataType)))
      if (present.isEmpty) return None
      val qualByRel = absByRel.map { case (r, a) =>
        val q = new Path(a).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
          .makeQualified(new Path(a)).toUri.getPath
        q -> r
      }
      val sizeByRel = relFiles.map(r =>
        r -> math.max(rowsByRel.getOrElse(r, 4096L), 64L)).toMap
      val bcSize = spark.sparkContext.broadcast(sizeByRel)
      val bcQual = spark.sparkContext.broadcast(qualByRel)
      val nCols = present.size
      val rows = df0
        .select(col("_metadata.file_path") +: present.map(col): _*)
        .rdd.mapPartitions { it =>
          val local = scala.collection.mutable.Map
            .empty[(String, Int), BloomFilter]
          val relOf = scala.collection.mutable.Map.empty[String, String]
          it.foreach { row =>
            val fp = row.getString(0)
            val rel = relOf.getOrElseUpdate(fp, {
              val p = fp.replaceFirst(Versioned.SchemeAuthorityRegex, "")
              bcQual.value.getOrElse(p, p)
            })
            var i = 0
            while (i < nCols) {
              val bf = local.getOrElseUpdate((rel, i),
                BloomFilter.create(bcSize.value.getOrElse(rel, 4096L), fpp))
              put(bf, row.get(i + 1))
              i += 1
            }
          }
          local.iterator.map { case ((rel, i), bf) => (rel, i, bf) }
        }
        // merge partial filters of a file split across partitions —
        // same (rel, rows, fpp) parameters, so mergeInPlace is legal.
        // Output partition count tracks the (files × cols) row count,
        // not the input split count: small commits land one file,
        // huge backfill chunks stay parallel.
        .map { case (rel, i, bf) => ((rel, i), bf) }
        .reduceByKey((a, b) => { a.mergeInPlace(b); a },
          math.max(1, (relFiles.size * nCols) / 20000 + 1))
      val bcCols = spark.sparkContext.broadcast(present.toIndexedSeq)
      val rowRdd = rows.map { case ((rel, i), bf) =>
        org.apache.spark.sql.Row(rel, bcCols.value(i), serialize(bf)) }
      val sidecarRel = s"bloom/${java.util.UUID.randomUUID()}"
      val dir = new Path(root, sidecarRel)
      import org.apache.spark.sql.types._
      spark.createDataFrame(rowRdd, StructType(Seq(
          StructField("file", StringType), StructField("col", StringType),
          StructField("bloom", BinaryType))))
        .write.parquet(dir.toString)
      // emptiness is decided from what LANDED (one footer-count read)
      // — checking the RDD up front would re-run the harvest pass
      if (spark.read.parquet(dir.toString).isEmpty) {
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        try fs.delete(dir, true)
        catch { case scala.util.control.NonFatal(_) => () }
        None
      } else Some(sidecarRel)
    } catch { case scala.util.control.NonFatal(_) => None }

  // --------------------------------------------------------------- consult

  /** Driver-side sidecar cache: qualified sidecar path ->
    * ((fileRel, colLower) -> filter). Small and bounded — blooms are
    * consulted at PLAN time for equality lookups only. */
  private val cache = new java.util.LinkedHashMap[
      String, Map[(String, String), BloomFilter]](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, Map[(String, String), BloomFilter]])
        : Boolean = size > 32
  }

  private def load(spark: SparkSession, root: Path,
      sidecarRel: String): Map[(String, String), BloomFilter] = {
    val key = new Path(root, sidecarRel).toString
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) return hit
    }
    val loaded =
      try spark.read.parquet(key).collect().flatMap { r =>
        try Some((r.getString(0), r.getString(1).toLowerCase) ->
          deserialize(r.getAs[Array[Byte]](2)))
        catch { case scala.util.control.NonFatal(_) => None }
      }.toMap
      catch { case scala.util.control.NonFatal(_) =>
        Map.empty[(String, String), BloomFilter] }
    cache.synchronized { cache.put(key, loaded) }
    loaded
  }

  private[graft] def invalidateCache(): Unit =
    cache.synchronized(cache.clear())

  /** May file `rel` (whose line carries sidecar `sidecarRel`) contain
    * ANY of `values` in column `col`? False ONLY on a definitive full
    * miss — every failure path keeps the file. */
  def mightContain(spark: SparkSession, root: Path, sidecarRel: String,
      rel: String, col: String, values: Seq[Any]): Boolean = {
    val m = load(spark, root, sidecarRel)
    m.get((rel, col.toLowerCase)) match {
      case None => true
      case Some(bf) =>
        values.isEmpty || values.exists(mightContainValue(bf, _))
    }
  }

  /** The equality lookup targets of a pushed-filter conjunction:
    * colLower -> candidate values (per conjunct; a file must be able
    * to contain at least one value of EVERY entry). Only top-level
    * `=` and `IN` conjuncts — anything disjunctive or range-y is the
    * min/max pruner's business. */
  def equalityTargets(filters: Seq[org.apache.spark.sql.sources.Filter])
      : Map[String, Seq[Any]] = {
    import org.apache.spark.sql.{sources => sf}
    filters.flatMap {
      case sf.EqualTo(a, v) if v != null && a.indexOf('.') < 0 =>
        Some(a.toLowerCase -> Seq(v))
      case sf.EqualNullSafe(a, v) if v != null && a.indexOf('.') < 0 =>
        Some(a.toLowerCase -> Seq(v))
      case sf.In(a, vs) if vs.nonEmpty && vs.forall(_ != null) &&
          a.indexOf('.') < 0 && vs.length <= 256 =>
        Some(a.toLowerCase -> vs.toSeq)
      case _ => None
    }.groupBy(_._1).view.mapValues { entries =>
      // multiple conjuncts on one column: intersect conservatively by
      // keeping the SMALLEST candidate set (sound: a file dropped for
      // failing one conjunct cannot satisfy the conjunction)
      entries.map(_._2).minBy(_.size)
    }.toMap
  }
}
