package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.QueryDef
import graft.sources.Tables

/** Multimodal (binary) column support (SURVEY §2.B B49 + north star).
  *
  * Media assets are opaque `binary` columns plus a typed metadata struct
  * — the production path would land them via
  * `spark.read.format("binaryFile")` or parquet binary columns. The test
  * tables carry no media, so blobs here are derived from `documents.text`
  * bytes; the *plumbing* (schema, partition-parallel decode, typed
  * output) is real.
  *
  * Decode is a clearly-marked deterministic STUB: the image/audio codec
  * libraries are not in this container (per the build brief), so
  * `decodeStub` fabricates dimensions/frames from a hash of the bytes —
  * same signature, batch shape, and partition-parallelism a real codec
  * UDF would have (Scala-side `mapPartitions`, the JVM analog of
  * `mapInPandas` batches).
  */
object Multimodal {

  /** Typed decode result a real codec would produce. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int,
                             height: Int, n_frames: Int, brightness: Double)

  /** STUB decode: deterministic pseudo-metadata from the blob bytes.
    * Replace the body with a real codec (javax.imageio / ffmpeg bindings)
    * in production; everything around it — the per-partition batch loop,
    * the typed Dataset output, the schema — stays as-is. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.floorMod(h, 1856)           // 64..1919
    val height = 64 + math.floorMod(h >> 11, 1016)    // 64..1079
    val frames = 1 + math.floorMod(h >> 21, 64)
    val brightness = math.floorMod(h, 1000) / 1000.0
    (width, height, frames, brightness)
  }

  val defs: Seq[QueryDef] = Seq(

    // B49(a) — binary column + metadata, all engine-built-ins, oracled.
    QueryDef(
      "q_multimodal_meta",
      (s, dir) => {
        val blob = col("text").cast("binary")
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            lit("text/plain").as("mime"),
            octet_length(blob).cast(LongType).as("n_bytes"),
            md5(blob).as("digest"),
            base64(substring(blob, 1, 16)).as("head16_b64"))
          .orderBy(col("doc_id"))
      },
      Some(
        """SELECT doc_id, 'text/plain' AS mime,
          |       octet_length(encode(text)) AS n_bytes,
          |       md5(text) AS digest,
          |       to_base64(encode(substring(text, 1, 16))) AS head16_b64
          |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // B49(b) — production ingest path: real files on disk read through
    // `spark.read.format("binaryFile")` (path/length/content/modTime —
    // the schema an image/audio lake lands with). The corpus is staged
    // as one file per document (distributed text write partitioned by
    // doc_id; the writer appends '\n'), then read back as opaque bytes;
    // doc_id recovers from the partition path. Oracled bit-exactly:
    // length and md5 of the staged bytes against DuckDB over the source
    // text.
    QueryDef(
      "q_multimodal_binfile",
      (s, dir) => {
        // stage a deterministic 1-in-10 slice ONCE per source dir and
        // reuse it for every subsequent run: the operator under test is
        // the binaryFile ingest path, and one tiny file per document is a
        // staging artifact of this harness (a real media lake already has
        // its files) — re-creating them each run would make the bench
        // measure file creation instead of the read
        val out = graft.Staging.cached(
          s"binfile_mod10_${graft.Staging.keyOf(dir)}_${graft.Staging.stampOf(dir)}",
          rev = 1) { tgt =>
          Tables.documents(s, dir)
            .filter(col("doc_id") % 10 === 0)
            .select(col("doc_id"), col("text"))
            .write.mode("overwrite").partitionBy("doc_id").format("text").save(tgt)
        }
        s.read.format("binaryFile")
          .option("pathGlobFilter", "part-*")
          .option("recursiveFileLookup", "true")
          .load(out)
          .select(
            regexp_extract(col("path"), "doc_id=(\\d+)", 1)
              .cast(LongType).as("doc_id"),
            col("length"),
            md5(col("content")).as("digest"))
          .orderBy(col("doc_id"))
      },
      Some(
        """SELECT doc_id,
          |       octet_length(encode(text || chr(10))) AS length,
          |       md5(text || chr(10)) AS digest
          |FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin)
    ),

    // B49(c) — partition-parallel decode via typed mapPartitions over
    // (id, blob) batches; STUB codec (see decodeStub). No oracle —
    // hash-derived fields aren't SQL-reproducible; MultimodalSpec pins
    // determinism and ranges.
    QueryDef(
      "q_multimodal_decode",
      (s, dir) => {
        import s.implicits._
        val blobs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("blob"))
          .as[(Long, Array[Byte])]
        blobs.mapPartitions { it =>
          it.map { case (id, bytes) =>
            val (w, h, f, b) = decodeStub(bytes)
            MediaMeta(id, bytes.length.toLong, w, h, f, b)
          }
        }.toDF()
          .orderBy(col("doc_id"))
      },
      None
    )
  )
}
