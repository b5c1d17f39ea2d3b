package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, TextAnalysis => TA}
import graft.tables.Tables
import graft.text.{TextFunctions => TF}

/** Text-quality / language-ID / token-counting / multimodal coverage
  * (SURVEY §7.5). Quality metrics, language votes and multimodal
  * metadata are pure Catalyst expressions with full DuckDB oracles; the
  * rolling-hash fingerprint and the decode-stub checksum/features are
  * rows-only (JVM hashing not reproducible in SQL).
  */
object AnalysisQueries extends QueryProvider {


  override val all: Seq[Q] = Seq(

    Q(
      "a01_quality",
      (s, dir) => {
        import s.implicits._
        val tok = TF.tokenize($"text")
        // fanOut: seven regex/token expressions per row (see graft.Par)
        graft.Par.fanOut(Tables.documents(s, dir))
          .select(
            $"doc_id",
            TA.wsTokenCount($"text").cast("long").as("ws_tokens"),
            TA.bpeishTokenCount($"text").cast("long").as("bpeish_tokens"),
            round(TA.punctRatio($"text"), 6).as("punct_ratio"),
            round(TA.digitRatio($"text"), 6).as("digit_ratio"),
            round(TA.stopwordRatio(tok), 6).as("stopword_ratio"),
            round(TA.meanWordLen(tok), 6).as("mean_word_len"),
            TA.qualityScore($"text", tok).as("quality"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH base AS (SELECT doc_id, text,
              |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok FROM documents),
              |m AS (SELECT doc_id, text, tok,
              |  ${TextSql.ratioItems},
              |  CASE WHEN len(tok) = 0 THEN 0.0 ELSE
              |    list_reduce(list_transform(tok, x -> len(x) * 1.0), (a, b) -> a + b) / len(tok) END AS mwl
              |  FROM base)
              |SELECT doc_id,
              |CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
              |CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS BIGINT) AS bpeish_tokens,
              |round(pr, 6) AS punct_ratio,
              |round(dr, 6) AS digit_ratio,
              |round(sr, 6) AS stopword_ratio,
              |round(mwl, 6) AS mean_word_len,
              |${TextSql.qualityExpr("len(tok)")} AS quality
              |FROM m ORDER BY doc_id""".stripMargin),
      bench = true),

    Q(
      "a02_langid",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .select($"doc_id", $"lang".as("declared"),
            TA.languageId($"text").as("guessed"))
          .orderBy($"doc_id")
      },
      Some(
        s"""WITH t AS (SELECT doc_id, lang,
           |  regexp_split_to_array(lower(text), '[^a-zA-Z]+') AS tk, text FROM documents),
           |v AS (SELECT doc_id, lang, text,
           |  ${TextSql.voteItems}
           |  FROM t)
           |SELECT doc_id, lang AS declared,
           |${TextSql.guessedCase} AS guessed
           |FROM v ORDER BY doc_id""".stripMargin)),

    // The base-31 mod-2^64 rolling hash IS SQL-expressible: HUGEINT
    // arithmetic + an explicit wrap, folding per-char codepoints. (Valid
    // while text is BMP-only — `ord` yields codepoints, the JVM folds
    // UTF-16 units; they agree below U+10000.)
    Q(
      "a03_fingerprints",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .select($"doc_id", TA.fingerprint($"text").as("fp"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |CAST(CASE WHEN m >= 9223372036854775808::HUGEINT
             |  THEN m - 18446744073709551616::HUGEINT ELSE m END AS BIGINT) AS fp
             |FROM (SELECT doc_id,
             |  CASE WHEN text IS NULL THEN 0::HUGEINT ELSE
             |  list_reduce(
             |    list_prepend(1125899906842597::HUGEINT,
             |      list_transform(range(length(text)), i -> ord(text[i+1])::HUGEINT)),
             |    (h, c) -> (31*h + c) % 18446744073709551616::HUGEINT) END AS m
             |  FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // PII-style scrubbing (curation pipeline): typed placeholders +
    // per-kind counts; md5 of the redacted text keeps the output small
    // while still pinning every replaced character.
    Q(
      "a04_redaction",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .withColumn("p", TA.piiCounts($"text"))
          .select($"doc_id", md5(TA.redact($"text")).as("redacted_md5"),
            $"p.n_urls".as("n_urls"), $"p.n_emails".as("n_emails"),
            $"p.n_phones".as("n_phones"))
          .orderBy($"doc_id")
      },
      Some(
        s"""SELECT doc_id,
           |md5(regexp_replace(regexp_replace(regexp_replace(text,
           |  '${TA.UrlRe}', '<URL>', 'g'),
           |  '${TA.EmailRe}', '<EMAIL>', 'g'),
           |  '${TA.PhoneRe}', '<PHONE>', 'g')) AS redacted_md5,
           |CAST(len(regexp_extract_all(text, '${TA.UrlRe}')) AS INTEGER) AS n_urls,
           |CAST(len(regexp_extract_all(regexp_replace(text, '${TA.UrlRe}', '<URL>', 'g'),
           |  '${TA.EmailRe}')) AS INTEGER) AS n_emails,
           |CAST(len(regexp_extract_all(text, '${TA.PhoneRe}')) AS INTEGER) AS n_phones
           |FROM documents ORDER BY doc_id""".stripMargin)),

    // Multimodal: schema plumbing + metadata (oracle) ...
    Q(
      "mm01_media_meta",
      (s, dir) => {
        import s.implicits._
        Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text")
          .select($"id", $"modality", $"meta.n_bytes".as("n_bytes"),
            $"meta.declared_lang".as("declared_lang"))
          .orderBy($"id")
      },
      Some("""SELECT doc_id AS id,
             |CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
             |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |lang AS declared_lang
             |FROM documents ORDER BY id""".stripMargin)),

    // ... and the partition-batched decode kernel — REAL image decode:
    // each payload is first written as a genuine 24-bit BMP
    // (grayImagePayload: bytes = gray levels of a 32-wide image, last
    // row zero-padded) and the kernel runs ImageIO's actual BMP parser,
    // computing every feature from DECODED PIXELS. The oracle stays
    // exact because the BMP stores our gray levels verbatim: pixel grid
    // = bytes zero-padded to 32·ceil(n/32) (one zero row when n = 0),
    // so DuckDB replays the pixel math on the padded byte list — FNV-1a
    // over gray levels in HUGEINT (XOR decomposed onto the low byte as
    // in a03), n_bytes = pixel count, n_frames = 1 (a still image).
    Q(
      "mm02_decoded_features",
      (s, dir) => {
        import s.implicits._
        Multimodal.decodeFeatures(Multimodal.grayImagePayload(
          Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text")))
          .select($"id", $"modality", $"n_bytes", $"n_frames", $"checksum",
            round(element_at($"feature", 2), 6).as("px_mean"))
          .orderBy($"id")
      },
      Some("""WITH b AS (
             |  SELECT doc_id AS id,
             |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |      ELSE 'video' END AS modality,
             |    hex(encode(coalesce(text,''))) AS hx,
             |    octet_length(encode(coalesce(text,''))) AS n
             |  FROM documents),
             |by2 AS (
             |  SELECT id, modality, n,
             |    greatest(1, (n + 31) // 32) AS h,
             |    list_concat(
             |      list_transform(range(n), i ->
             |        (strpos('0123456789ABCDEF', hx[2*i+1])-1)*16 +
             |        (strpos('0123456789ABCDEF', hx[2*i+2])-1)),
             |      list_transform(range(greatest(1, (n + 31) // 32) * 32 - n),
             |        i -> 0)) AS px
             |  FROM b),
             |hsh AS (
             |  SELECT *, list_reduce(
             |    list_prepend(14695981039346656037::HUGEINT,
             |      list_transform(px, x -> x::HUGEINT)),
             |    (acc, x) -> ((acc - acc % 256 +
             |        xor((acc % 256)::BIGINT, x::BIGINT)::HUGEINT)
             |      * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS h2
             |  FROM by2)
             |SELECT id, modality, CAST(h * 32 AS BIGINT) AS n_bytes,
             |  CAST(1 AS INTEGER) AS n_frames,
             |  CAST(CASE WHEN h2 >= 9223372036854775808::HUGEINT
             |    THEN h2 - 18446744073709551616::HUGEINT ELSE h2 END AS BIGINT) AS checksum,
             |  round(list_sum(px) * 1.0 / (h * 32), 6) AS px_mean
             |FROM hsh ORDER BY id""".stripMargin)),

    // The 1→many frame-sampling kernel (every 4th 256-byte frame, per
    // frame an FNV checksum of its window) — the explode-shaped batch
    // plumbing a video sampler needs, oracle-replayed by slicing the
    // recovered byte list per sampled frame.
    Q(
      "mm03_frame_samples",
      (s, dir) => {
        import s.implicits._
        Multimodal.frameSampleStub(
          Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text"))
          .orderBy($"id", $"frame_idx")
      },
      Some(s"""WITH $frameHashCtes
             |SELECT id, modality, CAST(frame_idx AS INTEGER) AS frame_idx,
             |  CAST(frame_bytes AS BIGINT) AS frame_bytes,
             |  ${FnvSql.toSigned("h")} AS frame_checksum
             |FROM hs ORDER BY id, frame_idx""".stripMargin)),

    // Cross-media shared-frame detection: exact frame-level dedup over
    // the mm03 sample stream — frames whose checksum recurs in ≥ 2
    // distinct media (embedded clips, intros, borrowed footage). ONE
    // hash agg over the frame table keyed on the 8-byte checksum; no
    // pairwise comparison at any scale (the d16 argument at frame
    // granularity). Oracle reuses mm03's byte-exact FNV frame chain.
    Q(
      "mm06_shared_frames",
      (s, dir) => {
        import s.implicits._
        Multimodal.frameSampleStub(
          Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text"))
          .groupBy($"frame_checksum")
          .agg(count(lit(1)).as("n_frames"),
            countDistinct($"id").as("n_media"))
          .filter($"n_media" >= 2)
          .orderBy($"frame_checksum")
      },
      Some(s"""WITH $frameHashCtes,
             |sg AS (SELECT ${FnvSql.toSigned("h")} AS frame_checksum
             |  FROM hs),
             |g AS (SELECT frame_checksum,
             |  CAST(count(*) AS BIGINT) AS n_frames FROM sg
             |  GROUP BY frame_checksum),
             |m AS (SELECT ${FnvSql.toSigned("h")} AS frame_checksum,
             |  CAST(count(DISTINCT id) AS BIGINT) AS n_media
             |  FROM hs GROUP BY 1)
             |SELECT frame_checksum, n_frames, n_media
             |FROM g JOIN m USING (frame_checksum)
             |WHERE n_media >= 2 ORDER BY frame_checksum""".stripMargin)),

    // Shot-boundary (scene-cut) detection over the mm03 frame-sample
    // stream: a cut is a consecutive frame pair (by frame_idx within a
    // medium) whose content checksums differ. One id-partitioned lag
    // window — the partition key is the medium, so the window never
    // degenerates to a single task at corpus scale — then a per-medium
    // rollup: frame count, cut count, cut rate, longest static run.
    Q(
      "mm07_scene_cuts",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"id").orderBy($"frame_idx")
        val fr = Multimodal.frameSampleStub(
          Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text"),
          frameBytes = 64, stride = 1)
          .select($"id", $"frame_idx", $"frame_checksum")
          .withColumn("cut",
            when(lag($"frame_checksum", 1).over(w).isNull, 0)
              .when(lag($"frame_checksum", 1).over(w) =!= $"frame_checksum", 1)
              .otherwise(0))
        // run id = number of cuts at or before the frame → static runs
        val runs = fr.withColumn("run_id", sum($"cut").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"id", $"run_id").agg(count(lit(1)).as("run_len"))
          .groupBy($"id").agg(max($"run_len").as("max_run"))
        fr.groupBy($"id")
          .agg(count(lit(1)).as("n_frames"),
            sum($"cut").cast("long").as("n_cuts"))
          .join(runs, Seq("id"))
          .select($"id", $"n_frames", $"n_cuts",
            round($"n_cuts" * 1.0 / ($"n_frames" - 1), 6).as("cut_rate"),
            $"max_run")
          .filter($"n_frames" > 1)
          .orderBy($"id")
      },
      Some(s"""WITH ${frameHashCtesFor(64, 1)},
             |f AS (SELECT id, frame_idx, ${FnvSql.toSigned("h")} AS fc
             |  FROM hs),
             |c AS MATERIALIZED (SELECT id, frame_idx, fc,
             |  CASE WHEN lag(fc) OVER (PARTITION BY id ORDER BY frame_idx)
             |       IS NULL THEN 0
             |       WHEN lag(fc) OVER (PARTITION BY id ORDER BY frame_idx)
             |       <> fc THEN 1 ELSE 0 END AS cut
             |  FROM f),
             |r AS (SELECT id, frame_idx, cut,
             |  sum(cut) OVER (PARTITION BY id ORDER BY frame_idx
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
             |  FROM c),
             |rl AS (SELECT id, run_id, count(*) AS run_len
             |  FROM r GROUP BY id, run_id),
             |mr AS (SELECT id, CAST(max(run_len) AS BIGINT) AS max_run
             |  FROM rl GROUP BY id),
             |ag AS (SELECT id, count(*) AS n_frames,
             |  CAST(sum(cut) AS BIGINT) AS n_cuts FROM c GROUP BY id)
             |SELECT ag.id, n_frames, n_cuts,
             |  round(n_cuts * 1.0 / (n_frames - 1), 6) AS cut_rate, max_run
             |FROM ag JOIN mr ON ag.id = mr.id
             |WHERE n_frames > 1 ORDER BY ag.id""".stripMargin)),

    // The resize kernel — REAL 2-D image resize: the payload is written
    // as a genuine 32-wide BMP (grayImagePayload), ImageIO decodes it
    // back, and the w×h pixel grid is area-averaged onto a FIXED 8×8
    // grid — source pixel (x, y) → cell (⌊y·8/h⌋·8 + ⌊x·8/32⌋), exact
    // integer arithmetic, per-cell round-6 means, rows absent when
    // h < 8 emit 0. The oracle replays the identical 2-D math on the
    // zero-padded byte grid (pixel p: y = p//32, x = p%32) over a dense
    // (id × cell) spine — exact because BMP decode∘encode is the
    // identity on the gray levels.
    Q(
      "mm08_resize_grid",
      (s, dir) => {
        import s.implicits._
        Multimodal.resizeGrid(Multimodal.grayImagePayload(
          Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text")),
          gridW = 8, gridH = 8)
          .orderBy($"id", $"cell")
      },
      Some("""WITH b AS (
             |  SELECT doc_id AS id,
             |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |      ELSE 'video' END AS modality,
             |    hex(encode(coalesce(text,''))) AS hx,
             |    octet_length(encode(coalesce(text,''))) AS n
             |  FROM documents),
             |by2 AS (
             |  SELECT id, greatest(1, (n + 31) // 32) AS h,
             |    list_concat(
             |      list_transform(range(n), i ->
             |        (strpos('0123456789ABCDEF', hx[2*i+1])-1)*16 +
             |        (strpos('0123456789ABCDEF', hx[2*i+2])-1)),
             |      list_transform(range(greatest(1, (n + 31) // 32) * 32 - n),
             |        i -> 0)) AS px
             |  FROM b),
             |pxr AS (SELECT id, h, unnest(range(h * 32)) AS p, unnest(px) AS v
             |  FROM by2),
             |agg AS (SELECT id,
             |  ((p // 32) * 8 // h) * 8 + (p % 32) // 4 AS cell,
             |  round(sum(v) * 1.0 / count(*), 6) AS av
             |  FROM pxr GROUP BY id, ((p // 32) * 8 // h) * 8 + (p % 32) // 4),
             |spine AS (SELECT id, modality, unnest(range(64)) AS cell FROM b)
             |SELECT s.id, s.modality, CAST(s.cell AS INTEGER) AS cell,
             |  coalesce(a.av, 0.0) AS v
             |FROM spine s LEFT JOIN agg a ON a.id = s.id AND a.cell = s.cell
             |ORDER BY s.id, s.cell""".stripMargin)),

    // Perceptual-hash (dHash) near-dup over the decode kernel: each
    // media row gets a 60-bit adjacent-"pixel" gradient hash from the
    // stub decoder, banded into 4×15-bit chunks; pairs colliding on
    // any band are exact-Hamming-verified (XOR + popcount, both
    // codegen'd). Pigeonhole: ≤3 differing bits can't straddle all 4
    // bands, so banding has COMPLETE recall at the ≤3 threshold — the
    // oracle therefore replays the semantics as an all-pairs Hamming
    // filter (equivalent by that argument) over the byte-recovered
    // dHash, while the Spark plan does the bucketed join that scales.
    Q(
      "mm04_dhash_neardup",
      (s, dir) => {
        import s.implicits._
        val h = Multimodal.dHashStub(
          Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text"))
          .select($"id", $"dhash")
        val bands = h.select($"id", $"dhash",
          explode(array((0 until 4).map(j =>
            struct(lit(j).as("bno"),
              shiftright($"dhash", 15 * j).bitwiseAND(lit(32767L))
                .as("bv"))): _*)).as("bd"))
          .select($"id", $"dhash", $"bd.bno".as("bno"), $"bd.bv".as("bv"))
        bands.select($"bno", $"bv", $"id".as("a"), $"dhash".as("ha"))
          .join(bands.select($"bno", $"bv", $"id".as("b"), $"dhash".as("hb")),
            Seq("bno", "bv"))
          .filter($"a" < $"b")
          .select($"a", $"b", $"ha", $"hb").distinct()
          .withColumn("hamming",
            bit_count($"ha".bitwiseXOR($"hb")).cast("int"))
          .filter($"hamming" <= 3)
          .select($"a", $"b", $"hamming")
          .orderBy($"a", $"b")
      },
      Some(mm04OracleSql)),

    // REAL-pixel perceptual dHash — the upgrade mm04's stub doc
    // promised: payloads wrapped as genuine BMPs, ImageIO-decoded,
    // area-averaged onto the classic 9×8 grid, bit i = 8r+c set iff
    // cell (r, c+1) is strictly brighter than (r, c) — brightness
    // compared by the exact integer cross-product sumA·cntB > sumB·cntA
    // (no float mean anywhere), 60 bits kept for signed portability.
    // The oracle rebuilds the padded pixel grid from hex bytes, the
    // same 2-D cell map (p → gy = (p/32)·8/h, gx = (p%32)·9/32), a
    // dense 8×9 spine (short images leave empty zero-brightness rows),
    // and the same cross-product bit rule.
    Q(
      "mm09_dhash_real",
      (s, dir) => {
        import s.implicits._
        Multimodal.dHashReal(Multimodal.grayImagePayload(
          Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text")))
          .orderBy($"id")
      },
      Some("""WITH b AS (
             |  SELECT doc_id AS id,
             |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |      ELSE 'video' END AS modality,
             |    hex(encode(coalesce(text,''))) AS hx,
             |    octet_length(encode(coalesce(text,''))) AS n
             |  FROM documents),
             |by2 AS (
             |  SELECT id, greatest(1, (n + 31) // 32) AS h,
             |    list_concat(
             |      list_transform(range(n), i ->
             |        (strpos('0123456789ABCDEF', hx[2*i+1])-1)*16 +
             |        (strpos('0123456789ABCDEF', hx[2*i+2])-1)),
             |      list_transform(range(greatest(1, (n + 31) // 32) * 32 - n),
             |        i -> 0)) AS px
             |  FROM b),
             |pxr AS (SELECT id, h, unnest(range(h * 32)) AS p, unnest(px) AS v
             |  FROM by2),
             |g AS (SELECT id, ((p // 32) * 8) // h AS gy,
             |  ((p % 32) * 9) // 32 AS gx,
             |  CAST(sum(v) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
             |  FROM pxr GROUP BY id, ((p // 32) * 8) // h, ((p % 32) * 9) // 32),
             |spine AS (SELECT id, gy, gx FROM (SELECT DISTINCT id FROM b)
             |  CROSS JOIN (SELECT unnest(range(8)) AS gy)
             |  CROSS JOIN (SELECT unnest(range(9)) AS gx)),
             |cells AS MATERIALIZED (SELECT sp.id, sp.gy, sp.gx,
             |  coalesce(g.s, 0) AS s, coalesce(g.c, 0) AS c
             |  FROM spine sp LEFT JOIN g
             |    ON g.id = sp.id AND g.gy = sp.gy AND g.gx = sp.gx),
             |bits AS (SELECT a.id, a.gy * 8 + a.gx AS i,
             |  CASE WHEN b2.s * greatest(a.c, 1) > a.s * greatest(b2.c, 1)
             |    THEN 1 ELSE 0 END AS bit
             |  FROM cells a JOIN cells b2
             |    ON b2.id = a.id AND b2.gy = a.gy AND b2.gx = a.gx + 1
             |  WHERE a.gx <= 7 AND a.gy * 8 + a.gx < 60),
             |hh AS (SELECT id, CAST(sum(bit * (1::BIGINT << i)) AS BIGINT)
             |  AS dhash FROM bits GROUP BY id)
             |SELECT b.id, b.modality, coalesce(hh.dhash, 0) AS dhash
             |FROM b LEFT JOIN hh ON hh.id = b.id
             |ORDER BY b.id""".stripMargin)),

    // REAL pHash — the DCT perceptual hash (robust to resize/blur where
    // dHash is not): BMP-decode → nearest-neighbor 32×32 → separable
    // DCT-II with the INTEGER-scaled cosine table Multimodal.CosQ →
    // top 8×8 block minus DC → median threshold → 63-bit hash. The
    // oracle interpolates the SAME 256 integer cosine literals and
    // replays the whole pipeline (the two separable contraction joins,
    // the rank-32 median, the bit sum) in pure BIGINT arithmetic — and
    // because nearest-neighbor resampling touches only 32x32 positions,
    // it hex-decodes just those 1,024 sampled bytes per image instead of
    // materializing the full pixel list (the full-list form was the sf1
    // gate's slowest post-tr oracle at 1,575 s) — and decodes them in
    // ONE list_transform projection per image: the earlier 1024-way
    // position cross-join carried the multi-KB hex string on every
    // output row (~100 GB of string movement at sf1, 250 s in-pool);
    // the per-image list keeps the string in place (integer-exact, so
    // the regrouping is hash-neutral). No libm cos on either side, so
    // there is no float boundary for a bit to flip across engines. At 100 TB the
    // kernel is one iterator-streamed mapPartitions pass (2·8·32² int
    // multiplies per image) and the hash feeds the same banded
    // near-dup join mm04 uses.
    Q(
      "mm10_phash",
      (s, dir) => {
        import s.implicits._
        Multimodal.pHashReal(Multimodal.grayImagePayload(
          Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text")))
          .orderBy($"id")
      },
      Some {
        val cosqValues = (for (u <- 0 until 8; y <- 0 until 32)
          yield s"($u,$y,${Multimodal.CosQ(u)(y)})").mkString(",")
        s"""WITH b AS (
           |  SELECT doc_id AS id,
           |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
           |      ELSE 'video' END AS modality,
           |    hex(encode(coalesce(text,''))) AS hx,
           |    octet_length(encode(coalesce(text,''))) AS n
           |  FROM documents),
           |by2 AS (
           |  SELECT id, hx, n, greatest(1, (n + 31) // 32) AS h
           |  FROM b),
           |cosq AS (SELECT * FROM (VALUES $cosqValues) AS cq(u, y, cw)),
           |grid AS MATERIALIZED (
           |  SELECT id, q // 32 AS gy, q % 32 AS gx, pv
           |  FROM (SELECT id,
           |    unnest(range(1024)) AS q,
           |    unnest(list_transform(range(1024), qq ->
           |      CASE WHEN (((qq // 32) * h) // 32) * 32 + (qq % 32) < n THEN
           |        (strpos('0123456789ABCDEF', hx[2*((((qq // 32) * h) // 32) * 32 + (qq % 32))+1])-1)*16 +
           |        (strpos('0123456789ABCDEF', hx[2*((((qq // 32) * h) // 32) * 32 + (qq % 32))+2])-1)
           |      ELSE 0 END)) AS pv
           |  FROM by2)),
           |grow AS (SELECT g.id, c.u, g.gx AS x,
           |  CAST(sum(g.pv * c.cw) AS BIGINT) AS gv
           |  FROM grid g JOIN cosq c ON c.y = g.gy
           |  GROUP BY g.id, c.u, g.gx),
           |coef AS (SELECT r.id, r.u, c.u AS v,
           |  CAST(sum(r.gv * c.cw) AS BIGINT) AS cv
           |  FROM grow r JOIN cosq c ON c.y = r.x
           |  GROUP BY r.id, r.u, c.u),
           |ac AS MATERIALIZED (SELECT id, cv, u * 8 + v - 1 AS i FROM coef
           |  WHERE NOT (u = 0 AND v = 0)),
           |med AS (SELECT id, cv AS m FROM (
           |  SELECT id, cv, row_number() OVER (PARTITION BY id ORDER BY cv) AS r
           |  FROM ac) WHERE r = 32),
           |hh AS (SELECT a.id,
           |  CAST(sum(CASE WHEN a.cv > m.m THEN (1::BIGINT << a.i) ELSE 0 END)
           |    AS BIGINT) AS phash
           |  FROM ac a JOIN med m ON m.id = a.id GROUP BY a.id)
           |SELECT b.id, b.modality, coalesce(hh.phash, 0) AS phash
           |FROM b LEFT JOIN hh ON hh.id = b.id
           |ORDER BY b.id""".stripMargin
      }),

    // Audio windowed energy (the DSP half of voice-activity
    // detection): audio-modality payloads window into 160-byte frames
    // (≈10 ms of 8-bit 16 kHz mono); each frame's INTEGER sum of
    // squared samples makes the voiced decision a pure integer
    // comparison (sumsq ≥ 9000·n — lowercase letters square to
    // ~9.4k-14.9k, whitespace to ~1k, so "speech" ≈ dense text), never
    // a float mean. The kernel is the real 1→many mapPartitions
    // plumbing (see Multimodal.audioEnergyStub); the oracle replays
    // the bytes via the hex trick and the same integer threshold.
    Q(
      "mm05_audio_energy",
      (s, dir) => {
        import s.implicits._
        val wins = Multimodal.audioEnergyStub(
          Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text"))
          .filter($"modality" === "audio")
        wins.groupBy($"id")
          .agg(count(lit(1)).as("n_windows"),
            count(when($"sumsq" >= lit(9000L) * $"n", 1)).as("n_voiced"))
          .select($"id", $"n_windows", $"n_voiced",
            round($"n_voiced" / $"n_windows", 6).as("voiced_ratio"))
          .orderBy($"id")
      },
      Some("""WITH m AS (SELECT doc_id AS id,
             |  hex(encode(coalesce(text,''))) AS hx,
             |  octet_length(encode(coalesce(text,''))) AS nb
             |  FROM documents WHERE doc_id % 3 = 1),
             |v AS (SELECT id, i // 160 AS win,
             |  (strpos('0123456789ABCDEF', hx[2*i+1])-1)*16 +
             |  (strpos('0123456789ABCDEF', hx[2*i+2])-1) AS x
             |  FROM m, unnest(range(nb)) AS t(i)),
             |w AS (SELECT id, win, count(*) AS n,
             |  CAST(sum(x * x) AS BIGINT) AS sumsq FROM v GROUP BY id, win)
             |SELECT id, CAST(count(*) AS BIGINT) AS n_windows,
             |  CAST(count(*) FILTER (WHERE sumsq >= 9000 * n) AS BIGINT)
             |    AS n_voiced,
             |  round(count(*) FILTER (WHERE sumsq >= 9000 * n) / count(*), 6)
             |    AS voiced_ratio
             |FROM w GROUP BY id ORDER BY id""".stripMargin)),

    // VAD-style segmentation over mm05's energy windows: consecutive
    // voiced frames merge into speech segments with a one-frame
    // hangover (a gap of one unvoiced window bridges; >= 2 splits) —
    // the temporal-segmentation step a speech pipeline runs between
    // energy scoring and transcription batching. Same fold shape as
    // d20's interval merge: per-id sorted voiced-window list ->
    // one row-local `aggregate`, no corpus-wide window function. The
    // oracle replays it as gaps-and-islands with a lag window.
    Q(
      "mm11_vad_segments",
      (s, dir) => {
        import s.implicits._
        val wins = Multimodal.audioEnergyStub(
          Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text"))
          .filter($"modality" === "audio")
        val voiced = wins.filter($"sumsq" >= lit(9000L) * $"n")
          .groupBy($"id")
          .agg(sort_array(collect_list($"win")).as("ws"))
        val segs = expr(
          """aggregate(ws, cast(array() as array<struct<s:int,e:int>>),
            |  (acc, w) -> if(size(acc) = 0 or w > element_at(acc, -1).e + 2,
            |    concat(acc, array(named_struct('s', w, 'e', w))),
            |    concat(slice(acc, 1, size(acc) - 1),
            |      array(named_struct('s', element_at(acc, -1).s,
            |        'e', w)))))""".stripMargin)
        voiced.withColumn("segs", segs)
          .select($"id",
            size($"ws").cast("long").as("n_voiced"),
            size($"segs").cast("long").as("n_segments"),
            expr("aggregate(segs, 0, (a, sp) -> greatest(a, sp.e - sp.s + 1))")
              .cast("long").as("max_seg_len"),
            round(expr("aggregate(segs, 0L, (a, sp) -> a + sp.e - sp.s + 1)")
              / size($"segs"), 6).as("mean_seg_len"))
          .orderBy($"id")
      },
      Some("""WITH m AS (SELECT doc_id AS id,
             |  hex(encode(coalesce(text,''))) AS hx,
             |  octet_length(encode(coalesce(text,''))) AS nb
             |  FROM documents WHERE doc_id % 3 = 1),
             |v AS (SELECT id, i // 160 AS win,
             |  (strpos('0123456789ABCDEF', hx[2*i+1])-1)*16 +
             |  (strpos('0123456789ABCDEF', hx[2*i+2])-1) AS x
             |  FROM m, unnest(range(nb)) AS t(i)),
             |w AS (SELECT id, win, count(*) AS n,
             |  CAST(sum(x * x) AS BIGINT) AS sumsq FROM v GROUP BY id, win),
             |vo AS (SELECT id, win FROM w WHERE sumsq >= 9000 * n),
             |st AS (SELECT id, win,
             |  CASE WHEN win > coalesce(lag(win) OVER (PARTITION BY id
             |    ORDER BY win), -3) + 2 THEN 1 ELSE 0 END AS new_seg
             |  FROM vo),
             |isl AS (SELECT id, win,
             |  sum(new_seg) OVER (PARTITION BY id ORDER BY win) AS grp
             |  FROM st),
             |sg AS (SELECT id, grp, min(win) AS s, max(win) AS e
             |  FROM isl GROUP BY id, grp),
             |vc AS (SELECT id, CAST(count(*) AS BIGINT) AS n_voiced
             |  FROM vo GROUP BY id)
             |SELECT sg.id, vc.n_voiced,
             |  CAST(count(*) AS BIGINT) AS n_segments,
             |  CAST(max(e - s + 1) AS BIGINT) AS max_seg_len,
             |  round(sum(e - s + 1) * 1.0 / count(*), 6) AS mean_seg_len
             |FROM sg JOIN vc USING (id)
             |GROUP BY sg.id, vc.n_voiced ORDER BY sg.id""".stripMargin)),

    // Long→wide pivot with an EXPLICIT value list: one partial-agg
    // shuffle, no extra values-discovery job (an implicit pivot first
    // runs a distinct scan to learn the columns — a full extra pass at
    // 100 TB), and a deterministic schema regardless of which langs a
    // given data slice happens to contain.
    Q(
      "a05_lang_source_pivot",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .groupBy($"source")
          .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
          .count()
          .select($"source",
            coalesce($"de", lit(0L)).as("n_de"),
            coalesce($"en", lit(0L)).as("n_en"),
            coalesce($"es", lit(0L)).as("n_es"),
            coalesce($"fr", lit(0L)).as("n_fr"),
            coalesce($"zh", lit(0L)).as("n_zh"))
          .orderBy($"source")
      },
      Some("""SELECT source,
             |count(*) FILTER (lang = 'de') AS n_de,
             |count(*) FILTER (lang = 'en') AS n_en,
             |count(*) FILTER (lang = 'es') AS n_es,
             |count(*) FILTER (lang = 'fr') AS n_fr,
             |count(*) FILTER (lang = 'zh') AS n_zh
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // Repetition signals (the Gopher-family quality filters): per-doc
    // duplicate-token and duplicate-3-gram fractions. Both are
    // row-local array expressions — a narrow map, no shuffle; a corpus
    // filter would just add `WHERE dup_3gram_ratio > τ` to the scan.
    Q(
      "a06_repetition",
      (s, dir) => {
        import s.implicits._
        graft.Par.fanOut(Tables.documents(s, dir))
          .filter($"doc_id" < 200)
          .select($"doc_id", TF.tokenize($"text").as("tk"))
          .select($"doc_id", $"tk",
            graft.operators.Dedup.shingles($"tk", 3).as("sh"))
          .select($"doc_id",
            size($"tk").cast("long").as("n_tokens"),
            size(array_distinct($"tk")).cast("long").as("uniq_tokens"),
            when(size($"tk") === 0, 0.0).otherwise(
              round(lit(1.0) - size(array_distinct($"tk")) * 1.0 / size($"tk"), 6))
              .as("dup_token_ratio"),
            when(size($"sh") === 0, 0.0).otherwise(
              round(lit(1.0) - size(array_distinct($"sh")) * 1.0 / size($"sh"), 6))
              .as("dup_3gram_ratio"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tk
             |  FROM documents WHERE doc_id < 200),
             |s AS (SELECT doc_id, tk,
             |  CASE WHEN len(tk) < 3 THEN []::VARCHAR[]
             |    ELSE list_transform(range(1, len(tk)-1),
             |      i -> array_to_string(tk[i:i+2], ' ')) END AS sh FROM t)
             |SELECT doc_id,
             |CAST(len(tk) AS BIGINT) AS n_tokens,
             |CAST(len(list_distinct(tk)) AS BIGINT) AS uniq_tokens,
             |CASE WHEN len(tk) = 0 THEN 0.0 ELSE
             |  round(1.0 - len(list_distinct(tk)) * 1.0 / len(tk), 6) END
             |  AS dup_token_ratio,
             |CASE WHEN len(sh) = 0 THEN 0.0 ELSE
             |  round(1.0 - len(list_distinct(sh)) * 1.0 / len(sh), 6) END
             |  AS dup_3gram_ratio
             |FROM s ORDER BY doc_id""".stripMargin)),

    // Wide→long UNPIVOT (melt) — the inverse of a05's pivot, through
    // Spark's native `unpivot` operator (an Expand node: row-local
    // 1→k fan-out, no shuffle, no values-discovery pass). Zero cells
    // survive the round-trip, so pivot→unpivot is lossless — the
    // oracle rebuilds the dense grid independently with a dimension
    // cross join against the grouped counts.
    Q(
      "a07_unpivot",
      (s, dir) => {
        import s.implicits._
        val langs = Seq("de", "en", "es", "fr", "zh")
        val wide = Tables.documents(s, dir)
          .groupBy($"source")
          .pivot("lang", langs)
          .count()
          .select($"source" +: langs.map(l =>
            coalesce(col(l), lit(0L)).as(s"n_$l")): _*)
        wide.unpivot(
          ids = Array($"source"),
          values = langs.map(l => col(s"n_$l")).toArray,
          variableColumnName = "lang",
          valueColumnName = "n")
          .select($"source", substring($"lang", 3, 2).as("lang"), $"n")
          .orderBy($"source", $"lang")
      },
      Some("""WITH src AS (SELECT DISTINCT source FROM documents),
             |l(lang) AS (VALUES ('de'),('en'),('es'),('fr'),('zh')),
             |c AS (SELECT source, lang, count(*) AS n
             |  FROM documents GROUP BY source, lang)
             |SELECT s.source, l.lang, CAST(coalesce(c.n, 0) AS BIGINT) AS n
             |FROM src s CROSS JOIN l
             |LEFT JOIN c ON c.source = s.source AND c.lang = l.lang
             |ORDER BY s.source, l.lang""".stripMargin)),

    // Bigram language-model scoring — the CCNet/perplexity-style quality
    // filter of LLM curation: train an add-one-smoothed bigram LM on the
    // corpus itself, score every document by mean log-probability of its
    // bigrams. Cross-engine float discipline: each DISTINCT bigram's
    // log-prob is computed once from exact integers and quantized to a
    // BIGINT micro-log (round(ln·1e6)); per-doc totals are then exact
    // integer sums — no double accumulation anywhere, so partitioning
    // can never flip the hash. Scale shape: two counting aggregates
    // (map-side combined), one shuffle join on the bigram key, one final
    // per-doc aggregate; the model is data-sized, never driver-sized.
    Q(
      "a08_bigram_lm",
      (s, dir) => {
        import s.implicits._
        // persisted (r15): four consumers — the bigram table twice (c2
        // build + the final per-doc join) and the unigram explode twice
        // (c1 + the vocab countDistinct) — re-tokenized the corpus up
        // to 4x per run without it. Same documented cacheIfNew class as
        // the d15 tf cache (plan-equal runs share the entry).
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", TF.tokenize($"text").as("t"))
          .transform(df => graft.Par.cacheIfNew(df)._1)
        val bg = toks.select($"doc_id", explode(zip_with(
          slice($"t", lit(1), greatest(size($"t") - 1, lit(0))),
          slice($"t", lit(2), greatest(size($"t") - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b))).as("g"))
        val c2 = bg.groupBy($"g").agg(count(lit(1)).as("c2"))
        val uni = toks.select(explode($"t").as("w"))
        val c1 = uni.groupBy($"w").agg(count(lit(1)).as("c1"))
        val v = uni.agg(countDistinct($"w").as("v"))
        val lm = c2
          .join(c1, split($"g", " ").getItem(0) === $"w")
          .crossJoin(broadcast(v))
          .select($"g",
            round(log(($"c2" + lit(1.0)) / ($"c1" + $"v")) * 1e6).cast("long").as("lp6"))
        bg.join(lm, Seq("g"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum($"lp6").as("sum_lp6"))
          .select($"doc_id", $"n_bigrams", $"sum_lp6",
            round($"sum_lp6" * 1.0 / $"n_bigrams" / 1e6, 6).as("mean_logp"))
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS t FROM documents),
             |bg AS (SELECT doc_id, unnest(list_transform(
             |    range(greatest(len(t)-1, 0)), i -> t[i+1] || ' ' || t[i+2])) AS g
             |  FROM tok),
             |c2 AS (SELECT g, count(*) AS c2 FROM bg GROUP BY g),
             |uni AS (SELECT unnest(t) AS w FROM tok),
             |c1 AS (SELECT w, count(*) AS c1 FROM uni GROUP BY w),
             |v AS (SELECT count(DISTINCT w) AS v FROM uni),
             |lm AS (SELECT c2.g,
             |    CAST(round(ln((c2.c2 + 1.0) / (c1.c1 + v.v)) * 1000000) AS BIGINT) AS lp6
             |  FROM c2 JOIN c1 ON c1.w = split_part(c2.g, ' ', 1) CROSS JOIN v)
             |SELECT bg.doc_id, count(*) AS n_bigrams,
             |CAST(sum(lm.lp6) AS BIGINT) AS sum_lp6,
             |round(sum(lm.lp6) * 1.0 / count(*) / 1000000.0, 6) AS mean_logp
             |FROM bg JOIN lm USING (g) GROUP BY bg.doc_id
             |ORDER BY bg.doc_id""".stripMargin)),

    // Fixed-window document chunking with overlap — the pretraining/RAG
    // chunker: 200-char windows every 150 chars (50-char overlap), one
    // chunk row per window start below the text length. Pure row-local
    // 1→many expression (sequence + substr inside a higher-order
    // transform, then posexplode) — a narrow Generate, no shuffle; the
    // chunk body travels as md5 so the gate pins every character
    // without exploding the output size.
    Q(
      "a09_chunks",
      (s, dir) => {
        import s.implicits._
        val (win, stride) = (200, 150)
        val n = (greatest(length($"text") - 1, lit(0)) / stride).cast("int")
        Tables.documents(s, dir)
          .filter($"text".isNotNull && length($"text") > 0)
          .select($"doc_id", posexplode(transform(sequence(lit(0), n), i =>
            $"text".substr(i * stride + 1, lit(win)))))
          .select($"doc_id", $"pos".cast("int").as("chunk_idx"),
            ($"pos" * stride).cast("long").as("start"),
            length($"col").cast("long").as("chunk_len"),
            md5($"col").as("chunk_md5"))
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
             |  WHERE text IS NOT NULL AND length(text) > 0),
             |c AS (SELECT doc_id,
             |    unnest(range(greatest(n - 1, 0) // 150 + 1)) AS chunk_idx,
             |    text, n FROM d)
             |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
             |CAST(chunk_idx * 150 AS BIGINT) AS start,
             |CAST(length(substr(text, chunk_idx * 150 + 1, 200)) AS BIGINT) AS chunk_len,
             |md5(substr(text, chunk_idx * 150 + 1, 200)) AS chunk_md5
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Per-group winsorization (outlier clipping at exact p05/p95) — the
    // robust-statistics step before any length- or score-based corpus
    // filter. One sort-based percentile aggregate per language (at
    // 100 TB: approx_percentile, same plan minus the per-group sort),
    // broadcast of the tiny per-group bounds, then a narrow row-local
    // clip. Spark `percentile` and DuckDB `quantile_cont` share the
    // (n-1)·q interpolation definition (proved by sk03).
    Q(
      "a10_winsorize",
      (s, dir) => {
        import s.implicits._
        val pct = Tables.documents(s, dir)
          .groupBy($"lang")
          .agg(expr("percentile(n_chars, 0.05)").as("p05"),
            expr("percentile(n_chars, 0.95)").as("p95"))
        Tables.documents(s, dir)
          .join(broadcast(pct), Seq("lang"))
          .select($"doc_id", $"lang", $"n_chars",
            round($"p05", 4).as("p05"), round($"p95", 4).as("p95"),
            round(least(greatest($"n_chars".cast("double"), $"p05"), $"p95"), 4)
              .as("clipped"),
            ($"n_chars" < $"p05" || $"n_chars" > $"p95").as("was_outlier"))
          .orderBy($"doc_id")
      },
      Some("""WITH p AS (SELECT lang,
             |  quantile_cont(n_chars, 0.05) AS p05,
             |  quantile_cont(n_chars, 0.95) AS p95
             |  FROM documents GROUP BY lang)
             |SELECT doc_id, d.lang, n_chars,
             |round(p05, 4) AS p05, round(p95, 4) AS p95,
             |round(least(greatest(n_chars * 1.0, p05), p95), 4) AS clipped,
             |(n_chars < p05 OR n_chars > p95) AS was_outlier
             |FROM documents d JOIN p ON p.lang = d.lang
             |ORDER BY doc_id""".stripMargin)),

    // Unicode normalization (multilingual-corpus stage 0): the corpus
    // text is ASCII, so the query first INJECTS decomposed combining
    // marks (a→a+U+0301, o→o+U+0303) identically on both engines, then
    // exercises the custom expressions end-to-end: nfc_normalize must
    // compose the pairs (length shrinks per injected mark) and
    // strip_accents must fold the result back to the original bytes
    // (md5 pins it). Both are narrow row-local maps with an ASCII
    // fast path — at 100 TB this is a zero-shuffle scan stage.
    Q(
      "a11_normalize",
      (s, dir) => {
        import s.implicits._
        import graft.functions.UnicodeNative
        graft.Par.fanOut(Tables.documents(s, dir))
          .filter($"doc_id" < 200)
          .select($"doc_id", $"text",
            regexp_replace(regexp_replace($"text", "a", "a\u0301"),
              "o", "o\u0303").as("dec"))
          .select($"doc_id", $"text", $"dec",
            UnicodeNative.nfc_normalize($"dec").as("comp"))
          .select($"doc_id",
            length($"dec").cast("long").as("n_decomposed"),
            length($"comp").cast("long").as("n_composed"),
            md5(UnicodeNative.strip_accents($"comp")).as("stripped_md5"),
            (md5(UnicodeNative.strip_accents($"comp")) === md5($"text"))
              .as("roundtrips"))
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, text,
             |  regexp_replace(regexp_replace(text, 'a', 'a' || chr(769), 'g'),
             |    'o', 'o' || chr(771), 'g') AS dec
             |  FROM documents WHERE doc_id < 200),
             |c AS (SELECT doc_id, text, dec, nfc_normalize(dec) AS comp FROM d)
             |SELECT doc_id,
             |CAST(length(dec) AS BIGINT) AS n_decomposed,
             |CAST(length(comp) AS BIGINT) AS n_composed,
             |md5(strip_accents(comp)) AS stripped_md5,
             |(md5(strip_accents(comp)) = md5(text)) AS roundtrips
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Unigram entropy + perplexity per document — the
    // lexical-diversity quality signal (spam/keyword-stuffed pages
    // have low entropy; natural prose sits near log2(vocab)).
    // Row-local: the one-pass token_counts map feeds a higher-order
    // fold, no shuffle. Entropy accumulates p·log2(1/p) (all
    // non-negative terms) rather than negating a sum — a single-token
    // doc would otherwise produce -0.0, whose string form hashes
    // differently across engines.
    Q(
      "a12_token_entropy",
      (s, dir) => {
        import s.implicits._
        graft.Par.fanOut(Tables.documents(s, dir))
          .filter($"doc_id" < 300)
          .select($"doc_id", TF.tokenize($"text").as("tk"))
          .select($"doc_id", size($"tk").cast("long").as("n_tokens"),
            TA.tokenEntropy($"tk").as("h"))
          .select($"doc_id", $"n_tokens",
            round($"h", 6).as("entropy"),
            round(pow(lit(2.0), $"h"), 6).as("perplexity"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tk
             |  FROM documents WHERE doc_id < 300),
             |x AS (SELECT doc_id, unnest(tk) AS tok FROM t),
             |c AS (SELECT doc_id, tok, count(*) AS c FROM x GROUP BY doc_id, tok),
             |n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY doc_id),
             |h AS (SELECT c.doc_id,
             |  sum((c * 1.0 / n) * log2(n * 1.0 / c)) AS h
             |  FROM c JOIN n USING (doc_id) GROUP BY c.doc_id)
             |SELECT t.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
             |round(coalesce(h.h, 0.0), 6) AS entropy,
             |round(power(2.0, coalesce(h.h, 0.0)), 6) AS perplexity
             |FROM t LEFT JOIN h ON h.doc_id = t.doc_id
             |ORDER BY t.doc_id""".stripMargin)),

    // Language-ID confusion matrix — the eval artifact that tells you
    // whether to trust the guesser per declared language (a02 gives
    // per-doc decisions; this is the aggregate quality report). One
    // narrow map + one small-group hash aggregation.
    Q(
      "a13_lang_confusion",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .select($"lang".as("declared"), TA.languageId($"text").as("guessed"))
          .groupBy($"declared", $"guessed")
          .agg(count(lit(1)).as("n"))
          .orderBy($"declared", $"guessed")
      },
      Some(
        s"""WITH t AS (SELECT doc_id, lang,
           |  regexp_split_to_array(lower(text), '[^a-zA-Z]+') AS tk, text FROM documents),
           |v AS (SELECT doc_id, lang, text,
           |  ${TextSql.voteItems}
           |  FROM t),
           |g AS (SELECT lang AS declared,
           |  ${TextSql.guessedCase} AS guessed
           |  FROM v)
           |SELECT declared, guessed, count(*) AS n FROM g
           |GROUP BY declared, guessed ORDER BY declared, guessed""".stripMargin)),

    // Equi-width histogram of document length, 10 buckets over the
    // observed [min, max] — pure INTEGER bucket arithmetic (width =
    // (max-min)/10 + 1, bucket = (x-min)/width) so both engines share
    // exact edge behavior; floats at bucket boundaries are where
    // cross-engine histograms silently disagree. The min/max row
    // broadcasts; the histogram is one small hash aggregation.
    Q(
      "a14_length_histogram",
      (s, dir) => {
        import s.implicits._
        graft.operators.Profiler
          .intHistogram(Tables.documents(s, dir), "n_chars", 10)
          .orderBy($"bucket")
      },
      Some("""WITH mm AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx
             |  FROM documents),
             |b AS (SELECT ((mx - mn) // 10 + 1) AS width, mn FROM mm),
             |h AS (SELECT ((n_chars - b.mn) // b.width)::INTEGER AS bucket,
             |  b.width, b.mn FROM documents CROSS JOIN b)
             |SELECT bucket,
             |CAST(mn + bucket * width AS BIGINT) AS lo,
             |CAST(mn + (bucket + 1) * width - 1 AS BIGINT) AS hi,
             |count(*) AS n
             |FROM h GROUP BY bucket, width, mn ORDER BY bucket""".stripMargin)),

    // Per-language Pearson correlation between document length and
    // whitespace token count — the exact-integer-moment formulation
    // (Stats.pearson): six integer sums in one hash agg, three IEEE
    // float ops per group. The built-in corr() would accumulate float
    // co-moments in partition-merge order and could not hash-match an
    // oracle; this does, under any partitioning.
    Q(
      "a15_length_corr",
      (s, dir) => {
        import s.implicits._
        val d = Tables.documents(s, dir)
          .select($"lang", $"n_chars",
            TA.wsTokenCount($"text").cast("long").as("ws_tokens"))
        graft.operators.Stats.pearson(d, "lang", $"n_chars", $"ws_tokens")
          .orderBy($"lang")
      },
      Some("""WITH d AS (SELECT lang, n_chars AS x,
             |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS y
             |  FROM documents),
             |m AS (SELECT lang, count(*) AS n,
             |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |  CAST(sum(x*y) AS BIGINT) AS sxy,
             |  CAST(sum(x*x) AS BIGINT) AS sxx,
             |  CAST(sum(y*y) AS BIGINT) AS syy
             |  FROM d GROUP BY 1),
             |v AS (SELECT lang, n, n*sxy - sx*sy AS cov,
             |  n*sxx - sx*sx AS vx, n*syy - sy*sy AS vy FROM m)
             |SELECT lang, n,
             |CASE WHEN vx > 0 AND vy > 0 THEN
             |  round(CAST(cov AS DOUBLE) /
             |    sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)), 6) END AS r
             |FROM v ORDER BY lang""".stripMargin)),

    // Zipf rank-frequency fit: OLS on (ln rank, ln freq) over the
    // top-500 vocabulary — the corpus-health diagnostic (natural text
    // slopes ≈ −1; boilerplate or synthetic spam bends the curve).
    // Unlike q40/a15 the regressors are REAL-valued, so the moment
    // sums are order-dependent IEEE additions; determinism comes from
    // (a) 9dp pre-rounding of each ln so both engines fold identical
    // inputs, and (b) accumulating all four moments by an ORDERED fold
    // in rank order (sort_array + aggregate here, list(… ORDER BY
    // rnk) + list_reduce in the oracle) — never a partition-order
    // float sum. The fold runs over ≤500 rows on the driver-side agg;
    // the corpus-scale work is the one term-count hash agg feeding it.
    Q(
      "a16_zipf_fit",
      (s, dir) => {
        import s.implicits._
        val tc = graft.Par.fanOut(Tables.documents(s, dir))
          .select(explode(TF.tokenize($"text")).as("token"))
          .groupBy($"token").agg(count(lit(1)).as("freq"))
          .orderBy(desc("freq"), $"token").limit(500)
        val p = tc
          .withColumn("rnk", row_number().over(
            Window.orderBy(desc("freq"), $"token")))
          .select($"rnk",
            round(log($"rnk".cast("double")), 9).as("x"),
            round(log($"freq".cast("double")), 9).as("y"))
          .withColumn("xx", $"x" * $"x")
          .withColumn("xy", $"x" * $"y")
        def fold(field: String) = expr(
          s"aggregate(transform(arr, e -> e.$field), cast(0.0 as double), (a, b) -> a + b)")
        p.agg(count(lit(1)).as("n"),
            sort_array(collect_list(struct($"rnk", $"x", $"y", $"xx", $"xy")))
              .as("arr"))
          .select($"n", fold("x").as("sx"), fold("y").as("sy"),
            fold("xx").as("sxx"), fold("xy").as("sxy"))
          .withColumn("slope",
            ($"n".cast("double") * $"sxy" - $"sx" * $"sy") /
              ($"n".cast("double") * $"sxx" - $"sx" * $"sx"))
          .withColumn("intercept",
            ($"sy" - $"slope" * $"sx") / $"n".cast("double"))
          .select($"n", round($"slope", 6).as("slope"),
            round($"intercept", 6).as("intercept"))
      },
      Some(s"""WITH tok AS (SELECT unnest(regexp_extract_all(lower(text),'[a-zA-Z]+')) AS token FROM documents),
              |tc AS (SELECT token, count(*) AS freq FROM tok GROUP BY token),
              |r AS (SELECT token, freq, row_number() OVER
              |  (ORDER BY freq DESC, token) AS rnk FROM tc QUALIFY rnk <= 500),
              |p AS (SELECT rnk, round(ln(rnk::DOUBLE), 9) AS x,
              |  round(ln(freq::DOUBLE), 9) AS y FROM r),
              |p2 AS (SELECT rnk, x, y, x*x AS xx, x*y AS xy FROM p),
              |l AS (SELECT count(*) AS n,
              |  list(x ORDER BY rnk) AS xs, list(y ORDER BY rnk) AS ys,
              |  list(xx ORDER BY rnk) AS xxs, list(xy ORDER BY rnk) AS xys
              |  FROM p2),
              |sums AS (SELECT n,
              |  list_reduce(list_prepend(0.0, xs), (a, b) -> a + b) AS sx,
              |  list_reduce(list_prepend(0.0, ys), (a, b) -> a + b) AS sy,
              |  list_reduce(list_prepend(0.0, xxs), (a, b) -> a + b) AS sxx,
              |  list_reduce(list_prepend(0.0, xys), (a, b) -> a + b) AS sxy
              |  FROM l),
              |f AS (SELECT n, sx, sy, sxx, sxy,
              |  (n::DOUBLE * sxy - sx * sy) / (n::DOUBLE * sxx - sx * sx) AS slope
              |  FROM sums)
              |SELECT CAST(n AS BIGINT) AS n, round(slope, 6) AS slope,
              |  round((sy - slope * sx) / n::DOUBLE, 6) AS intercept
              |FROM f""".stripMargin)),

    // Per-source distribution drift (PSI — the population stability
    // index monitoring uses between corpus snapshots): quality scores
    // binned by the GLOBAL exact deciles, per-source vs global bin
    // proportions, PSI = Σ (p_s − p_g)·ln(p_s/p_g) over the 10 bins.
    // Engine-stability pins: decile cuts 6dp-rounded before the strict
    // `q > cut` compare (sk03 proved the (n−1)·q interpolation
    // matches); empty bins floored at 1e-6 (the standard PSI ε); each
    // bin's term 9dp-pre-rounded and the 10 terms summed by an ORDERED
    // fold in bin order (the a16 discipline). Scale: one corpus pass
    // to score+bin (the cuts are a broadcast row), counts are two
    // hash aggs, the fold runs over sources×10 rows.
    Q(
      "a17_source_drift",
      (s, dir) => {
        import s.implicits._
        val scored = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"source",
            round(TA.qualityScore($"text", TF.tokenize($"text")), 6).as("q"))
        val cuts = scored.agg(expr(
          "transform(percentile(q, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9)), c -> round(c, 6))")
          .as("cuts"))
        val binned = scored.crossJoin(broadcast(cuts))
          .select($"source",
            (lit(1) + size(expr("filter(cuts, c -> q > c)"))).as("bin"))
          .localCheckpoint()
        val grid = binned.select($"source").distinct()
          .select($"source", explode(sequence(lit(1), lit(10))).as("bin"))
        val sb = grid.join(
            binned.groupBy($"source", $"bin").agg(count(lit(1)).as("cnt")),
            Seq("source", "bin"), "left")
          .select($"source", $"bin", coalesce($"cnt", lit(0L)).as("n_sb"))
        val gb = binned.groupBy($"bin").agg(count(lit(1)).as("n_b"))
        val ns = binned.groupBy($"source").agg(count(lit(1)).as("n_s"))
        val n = binned.agg(count(lit(1)).as("n"))
        val terms = sb
          .join(broadcast(gb), Seq("bin"), "left")
          .join(broadcast(ns), Seq("source"))
          .crossJoin(broadcast(n))
          .select($"source", $"bin", $"n_s",
            greatest($"n_sb" / $"n_s", lit(1e-6)).as("ps"),
            greatest(coalesce($"n_b", lit(0L)) / $"n", lit(1e-6)).as("pg"))
          .select($"source", $"bin", $"n_s",
            round(($"ps" - $"pg") * log($"ps" / $"pg"), 9).as("term"))
        terms.groupBy($"source")
          .agg(max($"n_s").as("n_docs"),
            sort_array(collect_list(struct($"bin", $"term"))).as("arr"))
          .select($"source", $"n_docs",
            round(expr(
              "aggregate(transform(arr, e -> e.term), cast(0.0 as double), (a, b) -> a + b)"),
              6).as("psi"))
          .orderBy($"source")
      },
      Some(s"""WITH base AS (SELECT doc_id, source, text,
              |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok FROM documents),
              |m AS (SELECT doc_id, source, text,
              |  ${TextSql.ratioItems},
              |  len(tok) AS ntok
              |  FROM base),
              |qd AS (SELECT source, ${TextSql.qualityExpr()} AS q FROM m),
              |c AS (SELECT list_transform(
              |  quantile_cont(q, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
              |  x -> round(x, 6)) AS cuts FROM qd),
              |b AS (SELECT source,
              |  1 + len(list_filter(cuts, x -> q > x)) AS bin FROM qd, c),
              |ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
              |  FROM b GROUP BY source),
              |grid AS (SELECT source, i AS bin FROM ns,
              |  unnest(range(1, 11)) AS t(i)),
              |sb AS (SELECT g.source, g.bin,
              |  CAST(count(bb.source) AS BIGINT) AS n_sb
              |  FROM grid g LEFT JOIN b bb
              |    ON bb.source = g.source AND bb.bin = g.bin
              |  GROUP BY g.source, g.bin),
              |gb AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_b
              |  FROM b GROUP BY bin),
              |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
              |terms AS (SELECT s.source, s.bin, ns.n_s,
              |  round((greatest(s.n_sb / ns.n_s, 1e-6)
              |       - greatest(coalesce(gb.n_b, 0) / tot.n, 1e-6))
              |    * ln(greatest(s.n_sb / ns.n_s, 1e-6)
              |       / greatest(coalesce(gb.n_b, 0) / tot.n, 1e-6)), 9) AS term
              |  FROM sb s LEFT JOIN gb USING (bin)
              |    JOIN ns ON ns.source = s.source CROSS JOIN tot),
              |l AS (SELECT source, max(n_s) AS n_docs,
              |  list(term ORDER BY bin) AS ts FROM terms GROUP BY source)
              |SELECT source, n_docs,
              |  round(list_reduce(list_prepend(0.0, ts), (a, b) -> a + b), 6)
              |    AS psi
              |FROM l ORDER BY source""".stripMargin)),

    // Flesch reading ease — the classic readability gate: every input
    // is an INTEGER count (words from the shared tokenizer, sentences
    // as [.!?]+ runs, syllables as [aeiouy]+ vowel groups summed by a
    // row-local integer fold), so the only float math is the fixed
    // 206.835 − 1.015·(w/s) − 84.6·(sy/w) formula, evaluated in the
    // identical association on both engines. Pure narrow map — a
    // corpus filter is `WHERE flesch BETWEEN …` on the scan.
    Q(
      "a18_readability",
      (s, dir) => {
        import s.implicits._
        graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id",
            TF.tokenize($"text").as("tokens"),
            greatest(size(expr("regexp_extract_all(text, '[.!?]+', 0)")),
              lit(1)).cast("long").as("n_sentences"))
          .select($"doc_id", $"n_sentences",
            size($"tokens").cast("long").as("n_words"),
            expr("aggregate(transform(tokens, " +
              "t -> size(regexp_extract_all(t, '[aeiouy]+', 0))), " +
              "0, (a, b) -> a + b)").cast("long").as("n_syllables"))
          .select($"doc_id", $"n_words", $"n_sentences", $"n_syllables",
            round(lit(206.835)
              - lit(1.015) * ($"n_words" / $"n_sentences")
              - lit(84.6) * ($"n_syllables" / greatest($"n_words", lit(1L))),
              6).as("flesch"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok,
             |  greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS ns
             |  FROM documents),
             |c AS (SELECT doc_id,
             |  CAST(len(tok) AS BIGINT) AS n_words,
             |  CAST(ns AS BIGINT) AS n_sentences,
             |  CAST(list_reduce(list_prepend(0,
             |    list_transform(tok, x -> len(regexp_extract_all(x, '[aeiouy]+')))),
             |    (a, b) -> a + b) AS BIGINT) AS n_syllables
             |  FROM t)
             |SELECT doc_id, n_words, n_sentences, n_syllables,
             |  round(206.835 - 1.015 * (n_words / n_sentences)
             |    - 84.6 * (n_syllables / greatest(n_words, 1)), 6) AS flesch
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Source-to-source vocabulary overlap matrix — which corpus slices
    // say the same things (the redundancy signal mixture design reads
    // before weighting sources). Pairwise Jaccard of the distinct
    // vocabularies, computed through a TOKEN-KEYED self-join of the
    // (source, token) set — sources sharing no token never meet, and
    // with S sources each token fans out to at most S(S−1)/2 pairs —
    // never a cross join of vocabularies. Union sizes via
    // inclusion–exclusion from the per-source counts.
    Q(
      "a19_source_overlap",
      (s, dir) => {
        import s.implicits._
        val dt = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"source", explode(TF.tokenize($"text")).as("token"))
          .distinct()
        val sizes = dt.groupBy($"source").agg(count(lit(1)).as("v"))
        val inter = dt.select($"source".as("s1"), $"token")
          .join(dt.select($"source".as("s2"), $"token"), Seq("token"))
          .filter($"s1" < $"s2")
          .groupBy($"s1", $"s2").agg(count(lit(1)).as("inter"))
        inter
          .join(broadcast(sizes.select($"source".as("s1"), $"v".as("v1"))),
            Seq("s1"))
          .join(broadcast(sizes.select($"source".as("s2"), $"v".as("v2"))),
            Seq("s2"))
          .select($"s1", $"s2", $"v1", $"v2", $"inter",
            round($"inter" / ($"v1" + $"v2" - $"inter"), 6).as("jaccard"))
          .orderBy($"s1", $"s2")
      },
      Some("""WITH dt AS (SELECT DISTINCT source, unnest(
             |    regexp_extract_all(lower(text),'[a-zA-Z]+')) AS token
             |  FROM documents),
             |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS v
             |  FROM dt GROUP BY source),
             |i AS (SELECT a.source AS s1, b.source AS s2,
             |  CAST(count(*) AS BIGINT) AS inter
             |  FROM dt a JOIN dt b ON a.token = b.token AND a.source < b.source
             |  GROUP BY a.source, b.source)
             |SELECT s1, s2, za.v AS v1, zb.v AS v2, inter,
             |  round(inter / (za.v + zb.v - inter), 6) AS jaccard
             |FROM i JOIN sz za ON za.source = i.s1
             |  JOIN sz zb ON zb.source = i.s2
             |ORDER BY s1, s2""".stripMargin)),

    // Term burstiness — the Fano factor (variance-to-mean of per-doc
    // counts, zeros included) for the top-100 corpus terms: bursty
    // topical words disperse far above 1, function words sit near it —
    // the dispersion signal behind stopword induction and keyword
    // weighting (Church & Gale's burstiness). All moments are INTEGER
    // sums over the per-doc TF table (n = the corpus doc count, so
    // absent docs contribute exact zeros without materializing them);
    // the Fano division is the only float, identical association both
    // engines.
    Q(
      "a20_burstiness",
      (s, dir) => {
        import s.implicits._
        val docs = graft.Par.fanOut(Tables.documents(s, dir))
        val nDocs = Tables.documents(s, dir).count()
        val tf = docs
          .select($"doc_id", explode(TF.tokenize($"text")).as("token"))
          .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
        tf.groupBy($"token")
          .agg(sum($"tf").as("st"), sum($"tf" * $"tf").as("st2"),
            count(lit(1)).as("df"))
          .orderBy(desc("st"), $"token").limit(100)
          .select($"token", $"st".as("total_tf"), $"df",
            round(
              ((($"st2" / lit(nDocs)) -
                ($"st" / lit(nDocs)) * ($"st" / lit(nDocs)))) /
                ($"st" / lit(nDocs)), 6).as("fano"))
          .orderBy(desc("total_tf"), $"token")
      },
      Some("""WITH n AS (SELECT count(*) AS nd FROM documents),
             |tf AS (SELECT doc_id, token, count(*) AS tf FROM
             |  (SELECT doc_id, unnest(regexp_extract_all(lower(text),'[a-zA-Z]+')) AS token
             |   FROM documents) GROUP BY doc_id, token),
             |m AS (SELECT token, CAST(sum(tf) AS BIGINT) AS st,
             |  CAST(sum(tf * tf) AS BIGINT) AS st2,
             |  CAST(count(*) AS BIGINT) AS df
             |  FROM tf GROUP BY token),
             |t AS (SELECT token, st, st2, df FROM m
             |  ORDER BY st DESC, token LIMIT 100)
             |SELECT token, st AS total_tf, df,
             |  round(((st2 / nd) - (st / nd) * (st / nd)) / (st / nd), 6)
             |    AS fano
             |FROM t, n ORDER BY total_tf DESC, token""".stripMargin)),

    // Heaps' law fit — vocabulary growth V(N) = k·N^β along the
    // doc_id-ordered corpus stream, the companion diagnostic to a16's
    // Zipf slope (β ≈ 0.5 for natural text; near-duplicate-heavy or
    // templated corpora flatten it). Per-doc NEW-vocabulary counts come
    // from one token→min(doc_id) hash agg (never a running distinct);
    // the two cumulative sums are integer window sums; the OLS on
    // (ln N, ln V) then follows the a16 discipline exactly — 9dp
    // pre-rounded logs, moments by an ORDERED fold over the checkpoint
    // list. At 100 TB the checkpoints would be a sampled subset of the
    // stream; the gate fits every doc.
    Q(
      "a21_heaps_fit",
      (s, dir) => {
        import s.implicits._
        val tok = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", explode(TF.tokenize($"text")).as("token"))
        val perDoc = tok.groupBy($"doc_id").agg(count(lit(1)).as("ntok"))
        val firsts = tok.groupBy($"token").agg(min($"doc_id").as("d0"))
          .groupBy($"d0").agg(count(lit(1)).as("vnew"))
        val w = Window.orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pts = perDoc
          .join(firsts.withColumnRenamed("d0", "doc_id"), Seq("doc_id"), "left")
          .select($"doc_id", $"ntok", coalesce($"vnew", lit(0L)).as("vnew"))
          .withColumn("cum_n", sum($"ntok").over(w))
          .withColumn("cum_v", sum($"vnew").over(w))
          .filter($"cum_n" > 0 && $"cum_v" > 0)
          .select($"doc_id",
            round(log($"cum_n".cast("double")), 9).as("x"),
            round(log($"cum_v".cast("double")), 9).as("y"))
          .withColumn("xx", $"x" * $"x")
          .withColumn("xy", $"x" * $"y")
        def fold(field: String) = expr(
          s"aggregate(transform(arr, e -> e.$field), cast(0.0 as double), (a, b) -> a + b)")
        pts.agg(count(lit(1)).as("n"),
            sort_array(collect_list(struct($"doc_id", $"x", $"y", $"xx", $"xy")))
              .as("arr"))
          .select($"n", fold("x").as("sx"), fold("y").as("sy"),
            fold("xx").as("sxx"), fold("xy").as("sxy"))
          .withColumn("beta",
            ($"n".cast("double") * $"sxy" - $"sx" * $"sy") /
              ($"n".cast("double") * $"sxx" - $"sx" * $"sx"))
          .withColumn("lnk", ($"sy" - $"beta" * $"sx") / $"n".cast("double"))
          .select($"n", round($"beta", 6).as("beta"),
            round($"lnk", 6).as("ln_k"))
      },
      Some(s"""WITH tok AS (SELECT doc_id,
              |  unnest(regexp_extract_all(lower(text),'[a-zA-Z]+')) AS token
              |  FROM documents),
              |pd AS (SELECT doc_id, count(*) AS ntok FROM tok GROUP BY doc_id),
              |fs AS (SELECT d0 AS doc_id, count(*) AS vnew FROM
              |  (SELECT token, min(doc_id) AS d0 FROM tok GROUP BY token)
              |  GROUP BY d0),
              |cm AS (SELECT pd.doc_id,
              |  sum(pd.ntok) OVER (ORDER BY pd.doc_id
              |    ROWS UNBOUNDED PRECEDING) AS cum_n,
              |  sum(coalesce(fs.vnew, 0)) OVER (ORDER BY pd.doc_id
              |    ROWS UNBOUNDED PRECEDING) AS cum_v
              |  FROM pd LEFT JOIN fs USING (doc_id)),
              |p AS (SELECT doc_id, round(ln(cum_n::DOUBLE), 9) AS x,
              |  round(ln(cum_v::DOUBLE), 9) AS y
              |  FROM cm WHERE cum_n > 0 AND cum_v > 0),
              |p2 AS (SELECT doc_id, x, y, x*x AS xx, x*y AS xy FROM p),
              |l AS (SELECT count(*) AS n,
              |  list(x ORDER BY doc_id) AS xs, list(y ORDER BY doc_id) AS ys,
              |  list(xx ORDER BY doc_id) AS xxs, list(xy ORDER BY doc_id) AS xys
              |  FROM p2),
              |sums AS (SELECT n,
              |  list_reduce(list_prepend(0.0, xs), (a, b) -> a + b) AS sx,
              |  list_reduce(list_prepend(0.0, ys), (a, b) -> a + b) AS sy,
              |  list_reduce(list_prepend(0.0, xxs), (a, b) -> a + b) AS sxx,
              |  list_reduce(list_prepend(0.0, xys), (a, b) -> a + b) AS sxy
              |  FROM l),
              |f AS (SELECT n, sx, sy, sxx, sxy,
              |  (n::DOUBLE * sxy - sx * sy) / (n::DOUBLE * sxx - sx * sx) AS beta
              |  FROM sums)
              |SELECT CAST(n AS BIGINT) AS n, round(beta, 6) AS beta,
              |  round((sy - beta * sx) / n::DOUBLE, 6) AS ln_k
              |FROM f""".stripMargin)),

    // Per-document novelty: the fraction of a doc's distinct 8-gram
    // shingles that occur in NO other document — the memorization /
    // boilerplate-risk score a training-data audit reports per doc.
    // One shingle→distinct-doc-count aggregation plus a join back:
    // linear in corpus size, no pairwise stage, and the shingle
    // explosion is a narrow per-row map (same scale shape as d01).
    Q(
      "a22_novelty",
      (s, dir) => {
        import s.implicits._
        val toks = Tables.documents(s, dir)
          .select($"doc_id", TF.tokenize($"text").as("t"))
          .where(size($"t") >= 8)
        val sh = toks.select($"doc_id", explode(array_distinct(
            transform(sequence(lit(0), size($"t") - 8),
              i => concat_ws(" ", slice($"t", i + 1, lit(8)))))).as("sh"))
        val df = sh.groupBy($"sh").agg(countDistinct($"doc_id").as("nd"))
        sh.join(df, "sh")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when($"nd" === 1, 1L).otherwise(0L)).as("n_unique"))
          .select($"doc_id", $"n_shingles", $"n_unique",
            round($"n_unique" * 1.0 / $"n_shingles", 6).as("novelty"))
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS t FROM documents),
             |sh0 AS (SELECT doc_id, list_distinct(list_transform(range(len(t)-7),
             |    i -> array_to_string(t[i+1:i+8], ' '))) AS shs
             |  FROM tok WHERE len(t) >= 8),
             |sh AS (SELECT doc_id, unnest(shs) AS sh FROM sh0),
             |df AS (SELECT sh, count(DISTINCT doc_id) AS nd FROM sh GROUP BY sh)
             |SELECT sh.doc_id, count(*) AS n_shingles,
             |  CAST(sum(CASE WHEN df.nd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
             |  round(sum(CASE WHEN df.nd = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             |    AS novelty
             |FROM sh JOIN df USING (sh) GROUP BY sh.doc_id ORDER BY doc_id""".stripMargin)),

    // Tokenizer fertility per language: mean tokens-per-whitespace-word
    // and UTF-8 bytes-per-token under a BPE-ish pretokenizer (letter
    // runs | digit runs | single punctuation) — the per-language token
    // budget signal a multilingual mixture design reads (a language
    // with 2× fertility costs 2× the context window per word). Narrow
    // per-row counts + one hash agg; per-doc ratios averaged in exact
    // decimal so partitioning can't move the 6th decimal.
    Q(
      "a23_tokenizer_fertility",
      (s, dir) => {
        import s.implicits._
        // Token count runs on the BMP-only text: Java regex counts an
        // astral char (emoji surrogate pair) as 2 punctuation tokens while
        // DuckDB's RE2 counts code points (1) — stripping [U+10000,
        // U+10FFFF] on BOTH sides pins the count engine-independently.
        // nb/nw stay on the original text (byte length and space-split
        // word count are code-point-agnostic).
        val tokRe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
        graft.Par.fanOut(Tables.documents(s, dir))
          .select($"lang",
            octet_length($"text").cast("long").as("nb"),
            TF.spaceWordCount($"text").cast("long").as("nw"),
            size(regexp_extract_all(
              regexp_replace($"text", "[\\x{10000}-\\x{10FFFF}]", ""),
              lit(tokRe), lit(0))).cast("long").as("nt"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"nt").as("n_tokens"),
            round(sum(($"nt" * 1.0 / greatest($"nw", lit(1L)))
                .cast("decimal(38,18)")).cast("double") / count(lit(1)), 6)
              .as("fertility"),
            round(sum(($"nb" * 1.0 / greatest($"nt", lit(1L)))
                .cast("decimal(38,18)")).cast("double") / count(lit(1)), 6)
              .as("bytes_per_token"))
          .orderBy($"lang")
      },
      Some("""WITH p AS (SELECT lang,
             |  octet_length(encode(text)) AS nb,
             |  len(string_split(text, ' ')) AS nw,
             |  len(regexp_extract_all(regexp_replace(text, '[\x{10000}-\x{10FFFF}]', '', 'g'),
             |    '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS nt
             |  FROM documents)
             |SELECT lang, count(*) AS n_docs,
             |  CAST(sum(nt) AS BIGINT) AS n_tokens,
             |  round(CAST(sum(CAST(nt * 1.0 / greatest(nw, 1)
             |    AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS fertility,
             |  round(CAST(sum(CAST(nb * 1.0 / greatest(nt, 1)
             |    AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS bytes_per_token
             |FROM p GROUP BY lang ORDER BY lang""".stripMargin)),

    // Bigram-LM surprisal — the CCNet-style language-model quality
    // filter: train an add-1-smoothed bigram LM on the corpus itself
    // (unigram + bigram count tables), then score every document by its
    // mean negative log10 bigram probability. Low surprisal = fluent /
    // in-distribution text; high = noise. Scale shape: the unigram table
    // is vocabulary-sized (broadcast), the bigram table is
    // corpus-bounded (hash join on the bigram key), and the per-doc
    // aggregation is one partial-agg shuffle — the whole filter is two
    // linear passes, the same shape a 100 TB KenLM-filter stage has.
    // Determinism: each bigram's -log10 P is rounded to 6dp (double
    // noise ~1e-15 vs the 1e-6 grid) and summed in DECIMAL so partition
    // order can't move the mean.
    Q(
      "a24_lm_surprisal",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir).select($"doc_id")
          .join(lmSurprisalPerDoc(s, dir), Seq("doc_id"), "left")
          .select($"doc_id", coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
            $"surprisal")
          .orderBy($"doc_id")
      },
      Some(s"""WITH $lmSurprisalCtes
              |SELECT d.doc_id, coalesce(pd.n_bigrams, 0) AS n_bigrams,
              |  pd.surprisal
              |FROM documents d LEFT JOIN pd USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    // CCNet perplexity buckets (Wenzek et al. 2020): split each
    // language's corpus into head / middle / tail TERCILES of the a24
    // LM surprisal — the published recipe keeps "head" (most fluent),
    // samples "middle", drops "tail". Tercile assignment is pure
    // integer arithmetic on (row_number, count) so both engines agree
    // bit-for-bit; per-bucket means are 6dp values summed in DECIMAL.
    // Scale note: the per-language rank window is exact-tercile gate
    // semantics; the 100 TB route — cutoffs from a bottom-k sample,
    // broadcast thresholds, no global sort — is a CODE PATH:
    // Sampling.sampledTerciles, gated as a35_ccnet_sampled below.
    Q(
      "a27_ccnet_buckets",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"lang").orderBy($"surprisal", $"doc_id")
        val n = Window.partitionBy($"lang")
        lmSurprisalPerDoc(s, dir)
          .join(Tables.documents(s, dir).select($"doc_id", $"lang"), "doc_id")
          .withColumn("rk", row_number().over(w))
          .withColumn("n", count(lit(1)).over(n))
          .withColumn("bucket",
            when(($"rk" - 1) * 3 < ($"n" - 1), "head")
              .when(($"rk" - 1) * 3 < ($"n" - 1) * 2, "middle")
              .otherwise("tail"))
          .groupBy($"lang", $"bucket")
          .agg(count(lit(1)).as("n_docs"),
            (expr("(2*cast(sum(cast(round(surprisal*1000000) as bigint)) as bigint)"
              + " + count(1)) DIV (2*count(1))").cast("double")
              / 1e6).as("mean_surprisal"),
            min($"surprisal").as("min_surprisal"),
            max($"surprisal").as("max_surprisal"))
          .orderBy($"lang", $"bucket")
      },
      Some(s"""WITH $lmSurprisalCtes,
              |j AS (SELECT pd.doc_id, d.lang, pd.surprisal
              |  FROM pd JOIN documents d USING (doc_id)),
              |r AS (SELECT *,
              |    row_number() OVER (PARTITION BY lang
              |      ORDER BY surprisal, doc_id) AS rk,
              |    count(*) OVER (PARTITION BY lang) AS n
              |  FROM j),
              |b AS (SELECT lang, surprisal,
              |    CASE WHEN (rk - 1) * 3 < (n - 1) THEN 'head'
              |      WHEN (rk - 1) * 3 < (n - 1) * 2 THEN 'middle'
              |      ELSE 'tail' END AS bucket
              |  FROM r)
              |SELECT lang, bucket, count(*) AS n_docs,
              |  ((2 * CAST(sum(CAST(round(surprisal * 1000000) AS BIGINT)) AS BIGINT)
              |    + count(*)) // (2 * count(*))) / 1000000.0 AS mean_surprisal,
              |  min(surprisal) AS min_surprisal,
              |  max(surprisal) AS max_surprisal
              |FROM b GROUP BY lang, bucket
              |ORDER BY lang, bucket""".stripMargin)),

    // Gopher-style rule gates (Rae et al. 2021 §A1.1): the explicit
    // per-document quality rules a pretraining pipeline applies before
    // any model-based filter — word-count band, mean-word-length band,
    // minimum stopword evidence, alphabetic-word fraction, symbol-to-
    // word ratio. Emitted as individual booleans (so a corpus report
    // can show WHICH rule rejects) plus the composite keep decision.
    // Pure narrow per-row expressions — no shuffle at all.
    Q(
      "a25_gopher_gates",
      (s, dir) => {
        import s.implicits._
        val tok = TF.tokenize($"text")
        val words = split(trim($"text"), "\\s+")
        val mwl = TA.meanWordLen(tok)
        val nw = size(words).cast("long")
        val alphaFrac = size(filter(words, w => w.rlike("[a-zA-Z]")))
          .cast("double") / greatest(size(words), lit(1))
        val nSym = size(regexp_extract_all($"text", lit("#|\\.\\.\\."), lit(0)))
        graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", nw.as("n_words"),
            round(mwl, 6).as("mean_word_len"),
            (nw >= 50 && nw <= 100000).as("g_word_count"),
            (mwl >= 3.0 && mwl <= 10.0).as("g_mean_word_len"),
            (graft.functions.TextNative.nltk_stop_count(tok) >= 2)
              .as("g_stopwords"),
            (alphaFrac >= 0.8).as("g_alpha_words"),
            (nSym.cast("double") / greatest(nw, lit(1L)) <= 0.1).as("g_symbols"))
          .withColumn("keep",
            $"g_word_count" && $"g_mean_word_len" && $"g_stopwords" &&
              $"g_alpha_words" && $"g_symbols")
          .orderBy($"doc_id")
      },
      Some(s"""WITH base AS (SELECT doc_id, text,
              |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok,
              |  regexp_split_to_array(trim(text), '\\s+') AS words
              |  FROM documents),
              |m AS (SELECT doc_id, text, tok, words,
              |  len(words) AS nw,
              |  CASE WHEN len(tok) = 0 THEN 0.0 ELSE
              |    list_reduce(list_transform(tok, x -> len(x) * 1.0),
              |      (a, b) -> a + b) / len(tok) END AS mwl,
              |  len(list_filter(tok, x -> (${TextSql.inWords(graft.text.StopWords.nltkEnglishAlpha, "x")})))
              |    AS nstop,
              |  len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]')))
              |    * 1.0 / greatest(len(words), 1) AS afrac,
              |  len(regexp_extract_all(text, '#|\\.\\.\\.')) AS nsym
              |  FROM base)
              |SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
              |  round(mwl, 6) AS mean_word_len,
              |  nw >= 50 AND nw <= 100000 AS g_word_count,
              |  mwl >= 3.0 AND mwl <= 10.0 AS g_mean_word_len,
              |  nstop >= 2 AS g_stopwords,
              |  afrac >= 0.8 AS g_alpha_words,
              |  nsym * 1.0 / greatest(nw, 1) <= 0.1 AS g_symbols,
              |  nw >= 50 AND nw <= 100000 AND (mwl >= 3.0 AND mwl <= 10.0)
              |    AND nstop >= 2 AND afrac >= 0.8
              |    AND nsym * 1.0 / greatest(nw, 1) <= 0.1 AS keep
              |FROM m ORDER BY doc_id""".stripMargin)),

    // DSIR importance weights (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling"): score every document
    // by the log-likelihood ratio of a TARGET-domain unigram LM (here:
    // the corpus's declared-English slice, the in-domain proxy) against
    // the SOURCE LM (the whole corpus), both add-1 smoothed over the
    // shared vocabulary. Positive log-weight = looks more like the
    // target domain than the raw pool; resampling by these weights is
    // the published recipe for domain-targeted pretraining selection.
    // Scale shape: both LMs are vocabulary-sized tables (broadcast), the
    // scoring pass is one narrow join + one per-doc agg — linear at any
    // corpus size, same as a24. Per-token llr is rounded to 6dp and
    // summed in DECIMAL so partitioning can't move the doc score.
    Q(
      "a26_dsir_weights",
      (s, dir) => {
        import s.implicits._
        val words = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", $"lang", explode(TF.tokenize($"text")).as("w"))
        // three references (source LM, target LM, scoring probe) replay
        // the scan — cheaper than persisting a corpus-sized exploded
        // stream; see the a24 note
        val src = words.groupBy($"w").agg(count(lit(1)).as("cs"))
        val tgt = words.where($"lang" === "en")
          .groupBy($"w").agg(count(lit(1)).as("ct"))
        val totals = src.agg(sum($"cs").as("ns"), count(lit(1)).as("v"))
        // coalesce like the oracle's tt CTE: a slice with no target-
        // domain docs must yield finite smoothed scores, not all-NULL
        val tTotal = tgt.agg(coalesce(sum($"ct"), lit(0L)).as("nt"))
        val lm = src.join(tgt, Seq("w"), "left")
          .select($"w", $"cs", coalesce($"ct", lit(0L)).as("ct"))
          .crossJoin(broadcast(totals)).crossJoin(broadcast(tTotal))
          .select($"w", round(log10(
            (($"ct" + lit(1.0)) / ($"nt" + $"v")) /
              (($"cs" + lit(1.0)) / ($"ns" + $"v"))), 6)
            .cast("decimal(18,6)").as("llr"))
        val perDoc = words
          .join(broadcast(lm), Seq("w"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            round(sum($"llr").cast("double"), 6).as("log_weight"))
        Tables.documents(s, dir).select($"doc_id", $"lang")
          .join(perDoc, Seq("doc_id"), "left")
          .select($"doc_id", $"lang",
            coalesce($"n_tokens", lit(0L)).as("n_tokens"),
            $"log_weight",
            coalesce($"log_weight" > 0.0, lit(false)).as("selected"))
          .orderBy($"doc_id")
      },
      Some("""WITH base AS (SELECT doc_id, lang,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS t FROM documents),
             |words AS (SELECT doc_id, lang, unnest(t) AS w FROM base),
             |src AS (SELECT w, count(*) AS cs FROM words GROUP BY w),
             |tgt AS (SELECT w, count(*) AS ct FROM words
             |  WHERE lang = 'en' GROUP BY w),
             |tot AS (SELECT CAST(sum(cs) AS BIGINT) AS ns, count(*) AS v FROM src),
             |tt AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS nt FROM tgt),
             |lm AS (SELECT w,
             |    CAST(round(log10(
             |      ((coalesce(ct, 0) + 1.0) / (nt + v)) /
             |      ((cs + 1.0) / (ns + v))), 6) AS DECIMAL(18,6)) AS llr
             |  FROM src LEFT JOIN tgt USING (w) CROSS JOIN tot CROSS JOIN tt),
             |pd AS (SELECT doc_id, count(*) AS n_tokens,
             |    round(CAST(sum(llr) AS DOUBLE), 6) AS log_weight
             |  FROM words JOIN lm USING (w) GROUP BY doc_id)
             |SELECT d.doc_id, d.lang, coalesce(pd.n_tokens, 0) AS n_tokens,
             |  pd.log_weight,
             |  coalesce(pd.log_weight > 0.0, false) AS selected
             |FROM documents d LEFT JOIN pd USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Language purity / code-switching gate (TA.languagePurity):
    // sentence split = the reference's split('.') semantics (t11);
    // lang-ID = the a02 one-pass native voter per sentence, with the
    // doc-level vote evaluated once per document below the Generate.
    // Narrow ops + one doc-keyed aggregation — scan-speed at 100 TB.
    Q(
      "a28_lang_purity",
      (s, dir) => {
        import s.implicits._
        TA.languagePurity(graft.Par.fanOut(Tables.documents(s, dir)),
            "doc_id", "text")
          .orderBy($"doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, text,
              |  regexp_split_to_array(lower(text), '[^a-zA-Z]+') AS tk
              |  FROM documents),
              |dv AS (SELECT doc_id, text, ${TextSql.voteItems}
              |  FROM d),
              |dl AS (SELECT doc_id, ${TextSql.guessedCase} AS doc_lang
              |  FROM dv),
              |e AS (SELECT doc_id,
              |  trim(unnest(regexp_split_to_array(text, '\\.'))) AS sentence
              |  FROM documents),
              |sv AS (SELECT doc_id, sentence AS text,
              |  regexp_split_to_array(lower(sentence), '[^a-zA-Z]+') AS tk
              |  FROM e WHERE length(sentence) > 0),
              |sv2 AS (SELECT doc_id, text, ${TextSql.voteItems}
              |  FROM sv),
              |sl AS (SELECT doc_id, ${TextSql.guessedCase} AS sent_lang
              |  FROM sv2)
              |SELECT dl.doc_id, dl.doc_lang, count(*) AS n_sent,
              |  CAST(sum(CASE WHEN sl.sent_lang = dl.doc_lang
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
              |  round(sum(CASE WHEN sl.sent_lang = dl.doc_lang
              |    THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS purity
              |FROM sl JOIN dl USING (doc_id)
              |GROUP BY dl.doc_id, dl.doc_lang
              |ORDER BY dl.doc_id""".stripMargin)),

    // Quality-classifier distillation (the GPT-3 / CCNet recipe: fit a
    // cheap linear model to reproduce rule-based gates, then score every
    // document with the smooth classifier so curation can threshold or
    // importance-sample instead of hard-filtering). Features are
    // 6dp-DECIMAL ratios centered on their corpus means (uncentered, the
    // ln-length column drowns the ratios and 6 full-batch rounds
    // saturate to the base rate — measured 410/500 vs 491/500 centered),
    // the label is a hard length/digit gate, and training is full-batch
    // logistic gradient descent with a FIXED 6 rounds at lr=8: every
    // per-row residual is rounded to 6dp and the gradient is summed in
    // DECIMAL, so the means and the learned weights are bit-identical
    // however the corpus is partitioned, and DuckDB replays the entire
    // training run as 6 unrolled CTE rounds.
    // Scale shape: one feature-projection pass, one mean pass, then the
    // centered projection is persisted (4 narrow decimals per doc); 6
    // map-reduce gradient passes each return four numbers to the driver
    // (partial aggregation does the work — nothing shuffles but 4
    // decimals per partition), then one broadcast-model scoring pass.
    // k-anonymity audit — the data-release gate: group the corpus by
    // its quasi-identifier tuple (source, lang, length bucket) and flag
    // every group smaller than k=5, where membership alone could
    // re-identify a contributor. Reports each group's size, the flag,
    // and the corpus-wide at-risk fraction (broadcast join of one
    // aggregate). One groupBy with map-side partial aggregation — the
    // audit costs one scan at any corpus size.
    Q(
      "a30_k_anonymity",
      (s, dir) => {
        import s.implicits._
        val k = 5L
        val groups = Tables.documents(s, dir)
          .groupBy($"source", $"lang",
            floor($"n_chars" / 100L).as("len_bucket"))
          .agg(count(lit(1)).as("group_n"))
        val risk = groups.agg(
          sum(when($"group_n" < k, $"group_n").otherwise(0L)).as("at_risk"),
          sum($"group_n").as("total"))
        groups.crossJoin(broadcast(risk))
          .select($"source", $"lang", $"len_bucket", $"group_n",
            ($"group_n" < k).as("violates_k"),
            round($"at_risk".cast("double") / $"total", 6).as("risk_frac"))
          .orderBy($"source", $"lang", $"len_bucket")
      },
      Some("""WITH g AS (SELECT source, lang,
             |  CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket,
             |  count(*) AS group_n
             |  FROM documents GROUP BY source, lang, floor(n_chars / 100)),
             |r AS (SELECT CAST(sum(CASE WHEN group_n < 5 THEN group_n
             |    ELSE 0 END) AS BIGINT) AS at_risk,
             |  CAST(sum(group_n) AS BIGINT) AS total FROM g)
             |SELECT source, lang, len_bucket, group_n,
             |  group_n < 5 AS violates_k,
             |  round(at_risk::DOUBLE / total, 6) AS risk_frac
             |FROM g CROSS JOIN r
             |ORDER BY source, lang, len_bucket""".stripMargin)),

    Q(
      "a29_lr_quality",
      (s, dir) => {
        import s.implicits._
        val raw = graft.operators.QualityModel
          .rawFeatures(graft.Par.fanOut(Tables.documents(s, dir)))
          .persist() // feeds the mean pass, 6 gradient passes + scoring
        val m = graft.operators.QualityModel.train(raw)
        graft.operators.QualityModel.scored(raw, m).orderBy($"doc_id")
      },
      Some(lrQualityOracle)),

    // LZ78 compressibility signal (TextAnalysis.lzPhrases): phrase
    // count of the incremental parse over each document's first 200
    // chars — the compression-ratio quality rule (repetitive template
    // text compresses into few long phrases; low lz_ratio flags it).
    // Integer/string arithmetic only, so both engines agree exactly;
    // the oracle replays the parse as a recursive CTE carrying the
    // (dict, cur, cnt) state per document.
    Q(
      "a31_lz_complexity",
      (s, dir) => {
        import s.implicits._
        graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id",
            length(substring($"text", 1, 200)).cast("long")
              .as("prefix_len"),
            TA.lzPhrases("text", 200).cast("long").as("n_phrases"))
          .withColumn("lz_ratio",
            round($"n_phrases" * 1.0 / greatest($"prefix_len", lit(1L)), 6))
          .orderBy($"doc_id")
      },
      Some("""WITH RECURSIVE lz AS (
             |  SELECT doc_id, substr(text, 1, 200) AS p, 0 AS i,
             |    CAST([] AS VARCHAR[]) AS dict, '' AS cur, 0 AS cnt
             |  FROM documents
             |  UNION ALL
             |  SELECT doc_id, p, i + 1,
             |    CASE WHEN list_contains(dict, cur || substr(p, i+1, 1))
             |      THEN dict
             |      ELSE list_append(dict, cur || substr(p, i+1, 1)) END,
             |    CASE WHEN list_contains(dict, cur || substr(p, i+1, 1))
             |      THEN cur || substr(p, i+1, 1) ELSE '' END,
             |    CASE WHEN list_contains(dict, cur || substr(p, i+1, 1))
             |      THEN cnt ELSE cnt + 1 END
             |  FROM lz WHERE i < length(p)),
             |f AS (SELECT doc_id, length(p) AS prefix_len,
             |  cnt + CASE WHEN cur = '' THEN 0 ELSE 1 END AS n_phrases
             |  FROM lz WHERE i = length(p))
             |SELECT doc_id, CAST(prefix_len AS BIGINT) AS prefix_len,
             |  CAST(n_phrases AS BIGINT) AS n_phrases,
             |  round(n_phrases * 1.0 / greatest(prefix_len, 1), 6) AS lz_ratio
             |FROM f ORDER BY doc_id""".stripMargin)),

    // SSIM verification of dHash candidates (mm12) — the second-stage
    // metric a perceptual-dedup pipeline runs on banded candidates
    // before acting: global SSIM (Wang et al. 2004, single-window
    // form) between the two candidates' REAL decoded 8×8 grids
    // (mm08's area-average resize). Pair stats are DECIMAL-exact
    // 64-cell sums; the formula is spelled in identical operation
    // order on both engines. Candidates are the mm04 banded pairs —
    // bucketed generation, quadratic work only within buckets.
    Q(
      "mm12_ssim_verify",
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.asMedia(Tables.documents(s, dir),
          "doc_id", "text")
        val h = Multimodal.dHashStub(media).select($"id", $"dhash")
        val bands = h.select($"id", $"dhash",
          explode(array((0 until 4).map(j =>
            struct(lit(j).as("bno"),
              shiftright($"dhash", 15 * j).bitwiseAND(lit(32767L))
                .as("bv"))): _*)).as("bd"))
          .select($"id", $"dhash", $"bd.bno".as("bno"), $"bd.bv".as("bv"))
        val pairs = bands
          .select($"bno", $"bv", $"id".as("a"), $"dhash".as("ha"))
          .join(bands.select($"bno", $"bv", $"id".as("b"),
            $"dhash".as("hb")), Seq("bno", "bv"))
          .filter($"a" < $"b")
          .select($"a", $"b", $"ha", $"hb").distinct()
          .filter(bit_count($"ha".bitwiseXOR($"hb")) <= 3)
          .select($"a", $"b")
        val grid = Multimodal.resizeGrid(
            Multimodal.grayImagePayload(media), gridW = 8, gridH = 8)
          .select($"id", $"cell", $"v")
        def dsum(c: org.apache.spark.sql.Column) =
          sum(c.cast("decimal(38,12)")).cast("double") / 64
        pairs
          .join(grid.as("gx"), $"gx.id" === $"a")
          .join(grid.as("gy"),
            $"gy.id" === $"b" && $"gy.cell" === $"gx.cell")
          .groupBy($"a", $"b")
          .agg(dsum($"gx.v").as("mux"), dsum($"gy.v").as("muy"),
            dsum($"gx.v" * $"gx.v").as("sxx"),
            dsum($"gy.v" * $"gy.v").as("syy"),
            dsum($"gx.v" * $"gy.v").as("sxy"))
          .select($"a", $"b", round(
            ((lit(2) * $"mux" * $"muy" + 6.5025) *
              (lit(2) * ($"sxy" - $"mux" * $"muy") + 58.5225)) /
            (($"mux" * $"mux" + $"muy" * $"muy" + 6.5025) *
              (($"sxx" - $"mux" * $"mux") +
                ($"syy" - $"muy" * $"muy") + 58.5225)), 6).as("ssim"))
          .orderBy($"a", $"b")
      },
      Some(mm12OracleSql)),

    // Source keyness — Dunning 1993 log-likelihood (G²): per source,
    // the terms most OVERREPRESENTED vs the rest of the corpus (the
    // corpus-linguistics "what makes this domain's vocabulary
    // distinctive" audit; a17 tracks drift over time, this contrasts
    // sources). One (source, word) hash agg (map-side combined), word
    // and source totals derived from it (both vocabulary-/source-
    // bounded, broadcast), a per-source top-5 window. The 2·Σ O·ln(O/E)
    // terms are spelled in identical operation order on both sides and
    // 6dp-rounded before ranking.
    Q(
      "a32_source_keyness",
      (s, dir) => {
        import s.implicits._
        val sw = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"source", explode(TF.tokenize($"text")).as("word"))
          .groupBy($"source", $"word").agg(count(lit(1)).as("o11"))
          .persist() // feeds word totals, source totals AND the probe
        val wt = sw.groupBy($"word").agg(sum($"o11").as("wtot"))
        val st = sw.groupBy($"source").agg(sum($"o11").as("r1"))
        val n = sw.agg(sum($"o11").as("n"))
        val scored = sw
          .join(broadcast(wt), "word").join(broadcast(st), "source")
          .crossJoin(broadcast(n))
          .withColumn("o12", $"wtot" - $"o11")
          .withColumn("r2", $"n" - $"r1")
          .withColumn("e11", $"r1" * $"wtot" / $"n")
          .withColumn("e12", $"r2" * $"wtot" / $"n")
          .withColumn("g2", round(lit(2.0) *
            (when($"o11" > 0, $"o11" * log($"o11" / $"e11"))
              .otherwise(lit(0.0)) +
             when($"o12" > 0, $"o12" * log($"o12" / $"e12"))
              .otherwise(lit(0.0))), 6))
          .filter($"o11" / $"r1" > $"o12" / $"r2") // overrepresented only
        val w = Window.partitionBy($"source")
          .orderBy($"g2".desc, $"word")
        scored.withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 5)
          .select($"source", $"rnk", $"word", $"o11", $"g2")
          .orderBy($"source", $"rnk")
      },
      Some("""WITH sw AS (SELECT source, w AS word,
             |  CAST(count(*) AS BIGINT) AS o11
             |  FROM (SELECT source,
             |    unnest(regexp_extract_all(lower(text), '[a-zA-Z]+')) AS w
             |    FROM documents) GROUP BY source, w),
             |wt AS (SELECT word, sum(o11) AS wtot FROM sw GROUP BY word),
             |st AS (SELECT source, sum(o11) AS r1 FROM sw GROUP BY source),
             |n AS (SELECT sum(o11) AS n FROM sw),
             |sc AS (SELECT sw.source, sw.word, sw.o11,
             |  wt.wtot - sw.o11 AS o12, n.n - st.r1 AS r2,
             |  st.r1 * wt.wtot / n.n AS e11,
             |  (n.n - st.r1) * wt.wtot / n.n AS e12, st.r1, n.n
             |  FROM sw JOIN wt USING (word) JOIN st USING (source)
             |  CROSS JOIN n),
             |g AS (SELECT source, word, o11,
             |  round(2.0 * (CASE WHEN o11 > 0
             |      THEN o11 * ln(o11 / e11) ELSE 0.0 END
             |    + CASE WHEN o12 > 0
             |      THEN o12 * ln(o12 / e12) ELSE 0.0 END), 6) AS g2
             |  FROM sc WHERE o11 * 1.0 / r1 > o12 * 1.0 / r2),
             |r AS (SELECT *, row_number() OVER (PARTITION BY source
             |  ORDER BY g2 DESC, word) AS rnk FROM g)
             |SELECT source, rnk, word, o11, g2 FROM r WHERE rnk <= 5
             |ORDER BY source, rnk""".stripMargin)),

    // Blocklist gate — the C4 §2.2 badwords mechanism as a
    // configurable term-list filter: per document, occurrences of
    // blocklisted terms, their token fraction, the strict C4 rule
    // (any hit drops the doc) AND the fraction-threshold variant the
    // softer pipelines use. The list here is a neutral placeholder
    // (the corpus is synthetic); production swaps the literal array.
    // One narrow codegen'd filter-count per row, no shuffle beyond
    // the ordered output.
    Q(
      "a33_blocklist_gate",
      (s, dir) => {
        import s.implicits._
        val blocked = Seq("slow", "dup", "spam")
        val hits = size(filter(TF.tokenize($"text"),
          x => array_contains(lit(blocked.toArray), x)))
        graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id",
            size(TF.tokenize($"text")).cast("long").as("n_tokens"),
            hits.cast("long").as("n_blocked"))
          .withColumn("blocked_frac",
            round($"n_blocked" * 1.0 / greatest($"n_tokens", lit(1L)), 6))
          .withColumn("pass_strict", $"n_blocked" === 0L)
          .withColumn("pass_soft", $"blocked_frac" <= 0.05)
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  regexp_extract_all(lower(text), '[a-zA-Z]+') AS tk
             |  FROM documents),
             |c AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
             |  CAST(len(list_filter(tk,
             |    x -> list_contains(['slow','dup','spam'], x))) AS BIGINT)
             |    AS n_blocked
             |  FROM t)
             |SELECT doc_id, n_tokens, n_blocked,
             |  round(n_blocked * 1.0 / greatest(n_tokens, 1), 6)
             |    AS blocked_frac,
             |  n_blocked = 0 AS pass_strict,
             |  round(n_blocked * 1.0 / greatest(n_tokens, 1), 6) <= 0.05
             |    AS pass_soft
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Hill tail-index of the per-source length distribution (a34) —
    // the heavy-tail characterization a14's histogram only eyeballs:
    // per source, the Hill estimator over the top-10 order statistics,
    // α̂ = 1 / mean(ln(xᵢ/x₁₁)) — small α̂ = fat tail (a few huge docs
    // dominate bytes; shard and truncation policy follows from this
    // number). Order statistics pick deterministically (length DESC,
    // doc_id), the 10 log terms DECIMAL-sum, one bounded window per
    // source.
    Q(
      "a34_length_tail_index",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"source")
          .orderBy($"n_chars".desc, $"doc_id")
        val ranked = Tables.documents(s, dir)
          .select($"source", $"doc_id", $"n_chars")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 11)
        val xk = ranked.filter($"rn" === 11)
          .select($"source", $"n_chars".as("x11"))
        ranked.filter($"rn" <= 10)
          .join(xk, Seq("source"))
          .groupBy($"source", $"x11")
          .agg(count(lit(1)).as("k"),
            sum(log($"n_chars" * lit(1.0) / $"x11")
              .cast("decimal(38,18)")).cast("double").as("slog"))
          .select($"source", $"k", $"x11",
            round(when($"slog" > 0, $"k" / $"slog").otherwise(lit(0.0)), 6)
              .as("hill_alpha"))
          .orderBy($"source")
      },
      Some("""WITH r AS (SELECT source, doc_id, n_chars,
             |  row_number() OVER (PARTITION BY source
             |    ORDER BY n_chars DESC, doc_id) AS rn
             |  FROM documents),
             |xk AS (SELECT source, n_chars AS x11 FROM r WHERE rn = 11),
             |g AS (SELECT r.source, xk.x11,
             |  CAST(count(*) AS BIGINT) AS k,
             |  CAST(sum(CAST(ln(r.n_chars * 1.0 / xk.x11)
             |    AS DECIMAL(38,18))) AS DOUBLE) AS slog
             |  FROM r JOIN xk USING (source) WHERE rn <= 10
             |  GROUP BY r.source, xk.x11)
             |SELECT source, k, x11,
             |  round(CASE WHEN slog > 0 THEN k / slog ELSE 0.0 END, 6)
             |    AS hill_alpha
             |FROM g ORDER BY source""".stripMargin)),

    // a27's 100 TB route, as CODE (Sampling.sampledTerciles): the
    // per-language head/middle surprisal CUTOFFS come from a
    // deterministic bottom-64-by-hash sample (sk10's recipe — map-side
    // partial top-k, no per-language sort), broadcast as literals, and
    // the corpus buckets by one narrow per-row CASE. Same output
    // contract as a27 (per lang×bucket counts + surprisal stats, plus
    // the two cutoffs), value-threshold tie rule instead of a27's
    // global-ordinal rank rule — the trade that removes the exact
    // route's language-count-bounded rank window. CcnetSampledSpec
    // pins ≥90% per-doc bucket agreement with the exact terciles.
    Q(
      "a35_ccnet_sampled",
      (s, dir) => {
        import s.implicits._
        val scored = lmSurprisalPerDoc(s, dir)
          .join(Tables.documents(s, dir).select($"doc_id", $"lang"), "doc_id")
        graft.operators.Sampling
          .sampledTerciles(scored, "doc_id", "lang", "surprisal", k = 64)
          .groupBy($"lang", $"bucket")
          .agg(count(lit(1)).as("n_docs"),
            (expr("(2*cast(sum(cast(round(surprisal*1000000) as bigint)) as bigint)"
              + " + count(1)) DIV (2*count(1))").cast("double")
              / 1e6).as("mean_surprisal"),
            min($"surprisal").as("min_surprisal"),
            max($"surprisal").as("max_surprisal"),
            max($"cut_head").as("cut_head"),
            max($"cut_middle").as("cut_middle"))
          .orderBy($"lang", $"bucket")
      },
      Some(s"""WITH $lmSurprisalCtes,
              |j AS (SELECT pd.doc_id, d.lang, pd.surprisal
              |  FROM pd JOIN documents d USING (doc_id)),
              |samp AS (SELECT lang, doc_id, surprisal FROM (
              |  SELECT lang, doc_id, surprisal,
              |    ${FnvSql.toSigned(FnvSql.perm("1", "doc_id::HUGEINT"))} AS hv
              |  FROM j)
              |  QUALIFY row_number() OVER (PARTITION BY lang
              |    ORDER BY hv, doc_id) <= 64),
              |ss AS (SELECT lang, surprisal,
              |  row_number() OVER (PARTITION BY lang
              |    ORDER BY surprisal, doc_id) AS r,
              |  count(*) OVER (PARTITION BY lang) AS m FROM samp),
              |cuts AS (SELECT lang,
              |  max(CASE WHEN r = (m + 2) // 3 THEN surprisal END) AS cut_head,
              |  max(CASE WHEN r = (2 * m + 2) // 3 THEN surprisal END)
              |    AS cut_middle
              |  FROM ss GROUP BY lang),
              |b AS (SELECT j.lang, j.surprisal, c.cut_head, c.cut_middle,
              |  CASE WHEN j.surprisal <= c.cut_head THEN 'head'
              |    WHEN j.surprisal <= c.cut_middle THEN 'middle'
              |    ELSE 'tail' END AS bucket
              |  FROM j JOIN cuts c USING (lang))
              |SELECT lang, bucket, count(*) AS n_docs,
              |  ((2 * CAST(sum(CAST(round(surprisal * 1000000) AS BIGINT)) AS BIGINT)
              |    + count(*)) // (2 * count(*))) / 1000000.0 AS mean_surprisal,
              |  min(surprisal) AS min_surprisal,
              |  max(surprisal) AS max_surprisal,
              |  max(cut_head) AS cut_head,
              |  max(cut_middle) AS cut_middle
              |FROM b GROUP BY lang, bucket
              |ORDER BY lang, bucket""".stripMargin)),

    // Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen &
    // Goodman 1999 eq. 4.26) beside a24's add-1 baseline: absolute
    // discount D = n1/(n1 + 2 n2) estimated from the bigram
    // count-of-counts, with the backoff mass routed to CONTINUATION
    // probability (how many distinct left-contexts a word follows, not
    // how often it occurs) — the smoothing KenLM ships and every
    // published LM-based quality filter actually uses. Scoring both
    // models in ONE joined pass makes the ranking shift directly
    // measurable (addone_surprisal is bit-identical to a24's column).
    // Scale shape: identical to a24 — the only additions are three
    // vocabulary-bounded broadcast sides (fan = distinct successors per
    // w1, cont = distinct predecessors per w2, and the 1-row discount)
    // hanging off the same two linear corpus passes. Determinism: D is
    // rounded to 6dp (an exact decimal in both engines), each bigram's
    // -log10 P to 6dp, per-doc means in exact integer micro-units.
    Q(
      "a36_kneser_ney",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", TF.tokenize($"text").as("t"))
        val uni = toks.select(explode($"t").as("w"))
          .groupBy($"w").agg(count(lit(1)).as("c1"))
        val vocab = uni.agg(count(lit(1)).as("vocab"))
        val bi = toks.where(size($"t") >= 2)
          .select($"doc_id", explode(expr(
            "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))"))
            .as("bg"))
          .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
        val bic = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("cb"))
        // n1/n2 = bigram types seen once/twice; tt = total bigram types
        // (the continuation-probability denominator). Degenerate
        // corpora with no singletons or doubletons fall back to D=0.5.
        val disc = bic.agg(
            sum(when($"cb" === 1, 1L).otherwise(0L)).as("n1"),
            sum(when($"cb" === 2, 1L).otherwise(0L)).as("n2"),
            count(lit(1)).as("tt"))
          .select(
            when($"n1" + lit(2L) * $"n2" === 0L, lit(0.5))
              .otherwise(round($"n1" / ($"n1" + lit(2.0) * $"n2"), 6))
              .as("d"),
            $"tt")
        val fan = bic.groupBy($"w1").agg(count(lit(1)).as("nf"))
        val cont = bic.groupBy($"w2").agg(count(lit(1)).as("cc"))
        val pd = bi
          .join(bic, Seq("w1", "w2"))
          .join(broadcast(uni.withColumnRenamed("w", "w1")), Seq("w1"))
          .join(broadcast(fan), Seq("w1"))
          .join(broadcast(cont), Seq("w2"))
          .crossJoin(broadcast(disc))
          .crossJoin(broadcast(vocab))
          .withColumn("nlp",
            round(-log10(greatest($"cb" - $"d", lit(0.0)) / $"c1" +
              ($"d" * $"nf" / $"c1") * ($"cc" / $"tt")), 6)
              .cast("decimal(18,6)"))
          .withColumn("nlp1",
            round(-log10(($"cb" + lit(1.0)) / ($"c1" + $"vocab")), 6)
              .cast("decimal(18,6)"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            sum(($"nlp" * 1000000).cast("long")).as("sm"),
            sum(($"nlp1" * 1000000).cast("long")).as("sm1"))
          .select($"doc_id", $"n_bigrams",
            (expr("(2*sm + n_bigrams) DIV (2*n_bigrams)").cast("double")
              / 1e6).as("kn_surprisal"),
            (expr("(2*sm1 + n_bigrams) DIV (2*n_bigrams)").cast("double")
              / 1e6).as("addone_surprisal"))
        Tables.documents(s, dir).select($"doc_id")
          .join(pd, Seq("doc_id"), "left")
          .select($"doc_id", coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
            $"kn_surprisal", $"addone_surprisal")
          .orderBy($"doc_id")
      },
      Some("""WITH base AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS t FROM documents),
             |u AS (SELECT w, count(*) AS c1
             |  FROM (SELECT unnest(t) AS w FROM base) GROUP BY w),
             |v AS (SELECT count(*) AS vocab FROM u),
             |bg2 AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2
             |  FROM (SELECT doc_id, unnest(list_transform(range(len(t)-1),
             |      i -> struct_pack(w1 := t[i+1], w2 := t[i+2]))) AS g
             |    FROM base WHERE len(t) >= 2) s),
             |bc AS MATERIALIZED (SELECT w1, w2, count(*) AS cb
             |  FROM bg2 GROUP BY w1, w2),
             |dsc AS (SELECT CASE WHEN n1 + 2*n2 = 0 THEN 0.5
             |    ELSE round(n1 / (n1 + 2.0*n2), 6) END AS d, tt
             |  FROM (SELECT sum(CASE WHEN cb = 1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN cb = 2 THEN 1 ELSE 0 END) AS n2,
             |    count(*) AS tt FROM bc)),
             |fan AS (SELECT w1, count(*) AS nf FROM bc GROUP BY w1),
             |cont AS (SELECT w2, count(*) AS cc FROM bc GROUP BY w2),
             |sc AS (SELECT doc_id,
             |    CAST(round(-log10(greatest(cb - d, 0.0) / c1 +
             |      (d * nf / c1) * (cc / tt)), 6) AS DECIMAL(18,6)) AS nlp,
             |    CAST(round(-log10((cb + 1.0) / (c1 + vocab)), 6)
             |      AS DECIMAL(18,6)) AS nlp1
             |  FROM bg2 JOIN bc USING (w1, w2) JOIN u ON bg2.w1 = u.w
             |  JOIN fan USING (w1) JOIN cont USING (w2)
             |  CROSS JOIN dsc CROSS JOIN v),
             |pd AS (SELECT doc_id, count(*) AS n_bigrams,
             |    ((2 * CAST(sum(CAST(nlp * 1000000 AS BIGINT)) AS BIGINT)
             |      + count(*)) // (2 * count(*))) / 1000000.0 AS kn_surprisal,
             |    ((2 * CAST(sum(CAST(nlp1 * 1000000 AS BIGINT)) AS BIGINT)
             |      + count(*)) // (2 * count(*))) / 1000000.0 AS addone_surprisal
             |  FROM sc GROUP BY doc_id)
             |SELECT d.doc_id, coalesce(pd.n_bigrams, 0) AS n_bigrams,
             |  pd.kn_surprisal, pd.addone_surprisal
             |FROM documents d LEFT JOIN pd USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Heaps'-law type-growth audit: V(N) ≈ K·N^β over word-TRIGRAM
    // types (the unigram vocabulary of the synthetic corpus saturates
    // in the first prefix — 31 words — while n-gram types keep
    // growing, and n-gram type growth is the signal that actually
    // prices BPE merge pressure and dedup index size). Eight id-range
    // prefix checkpoints accumulate (docs, tokens, distinct trigrams
    // first seen), then one log-log OLS fit yields (β, log10 K) — the
    // exponent a data-scaling plan reads to predict how much NEW
    // vocabulary another 10× of corpus buys. Scale shape: checkpoint
    // index is a pure per-row formula on doc_id against broadcast
    // min/max (no global rank window), so the whole audit is two hash
    // aggregates (per-doc tokens, per-trigram first doc) + an 8-row
    // cumulative. Determinism: log10 values rounded to 6dp, OLS
    // moments summed as exact decimals, final divisions in one double
    // op order.
    Q(
      "a37_heaps_law",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", TF.tokenize($"text").as("t"))
        val bounds = broadcast(toks.agg(
          min($"doc_id").as("lo"),
          (max($"doc_id") - min($"doc_id") + 1L).as("span")))
        // integer div (Column./ on longs is DOUBLE division)
        def ckpt(idExpr: String) =
          expr(s"cast((($idExpr - lo) * 8) div span as int) + 1")
        // per-doc token counts -> cumulative tokens/docs per checkpoint
        val dstat = toks.select($"doc_id", size($"t").cast("long").as("nt"))
          .crossJoin(bounds)
          .groupBy(ckpt("doc_id").as("ck"))
          .agg(count(lit(1)).as("d"), sum($"nt").as("n"))
        // per-trigram first-occurrence doc -> cumulative type count
        val wstat = toks.where(size($"t") >= 3)
          .select($"doc_id", explode(expr(
            "transform(sequence(0, size(t)-3), " +
              "i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).as("w"))
          .groupBy($"w").agg(min($"doc_id").as("fd"))
          .crossJoin(bounds)
          .groupBy(ckpt("fd").as("ck"))
          .agg(count(lit(1)).as("v"))
        val wcum = org.apache.spark.sql.expressions.Window
          .orderBy($"ck").rowsBetween(Long.MinValue, 0)
        val pts = dstat.join(wstat, Seq("ck"), "full")
          .select($"ck", coalesce($"d", lit(0L)).as("d"),
            coalesce($"n", lit(0L)).as("n"), coalesce($"v", lit(0L)).as("v"))
          .select($"ck",
            sum($"d").over(wcum).as("n_docs"),
            sum($"n").over(wcum).as("n_tokens"),
            sum($"v").over(wcum).as("vocab"))
          // Guard the log10: Spark returns NULL for log10(<=0) while
          // DuckDB returns -inf, so a degenerate prefix (docs but zero
          // trigram types yet) must be excluded identically on both sides.
          .filter($"n_tokens" > 0 && $"vocab" > 0)
          .select($"ck", $"n_docs", $"n_tokens", $"vocab",
            round(log10($"n_tokens"), 6).cast("decimal(18,6)").as("x"),
            round(log10($"vocab"), 6).cast("decimal(18,6)").as("y"))
        val fit = pts.agg(count(lit(1)).as("m"),
            sum($"x").as("sx"), sum($"y").as("sy"),
            sum(($"x" * $"y").cast("decimal(38,12)")).as("sxy"),
            sum(($"x" * $"x").cast("decimal(38,12)")).as("sxx"))
          .select(
            round((($"m" * $"sxy" - $"sx" * $"sy").cast("double")) /
              (($"m" * $"sxx" - $"sx" * $"sx").cast("double")), 6).as("beta"),
            $"m", $"sx", $"sy", $"sxy", $"sxx")
          .select($"beta",
            round(($"sy".cast("double") - $"beta" * $"sx".cast("double"))
              / $"m", 6).as("log10_k"))
        pts.select($"ck", $"n_docs", $"n_tokens", $"vocab",
            $"x".cast("double").as("log10_tokens"),
            $"y".cast("double").as("log10_vocab"))
          .crossJoin(broadcast(fit))
          .orderBy($"ck")
      },
      Some("""WITH tok AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS t FROM documents),
             |bounds AS (SELECT min(doc_id) AS lo,
             |  max(doc_id) - min(doc_id) + 1 AS span FROM tok),
             |dstat AS (SELECT
             |    CAST((doc_id - lo) * 8 // span AS INTEGER) + 1 AS ck,
             |    count(*) AS d, CAST(sum(len(t)) AS BIGINT) AS n
             |  FROM tok CROSS JOIN bounds GROUP BY 1),
             |fw AS (SELECT w, min(doc_id) AS fd
             |  FROM (SELECT doc_id, unnest(list_transform(range(len(t)-2),
             |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS w
             |    FROM tok WHERE len(t) >= 3) GROUP BY w),
             |wstat AS (SELECT
             |    CAST((fd - lo) * 8 // span AS INTEGER) + 1 AS ck,
             |    count(*) AS v
             |  FROM fw CROSS JOIN bounds GROUP BY 1),
             |pts AS (SELECT ck,
             |    CAST(sum(d) OVER wc AS BIGINT) AS n_docs,
             |    CAST(sum(n) OVER wc AS BIGINT) AS n_tokens,
             |    CAST(sum(v) OVER wc AS BIGINT) AS vocab
             |  FROM (SELECT coalesce(ds.ck, ws.ck) AS ck,
             |      coalesce(d, 0) AS d, coalesce(n, 0) AS n,
             |      coalesce(v, 0) AS v
             |    FROM dstat ds FULL JOIN wstat ws USING (ck))
             |  WINDOW wc AS (ORDER BY ck ROWS UNBOUNDED PRECEDING)),
             |pxy AS (SELECT ck, n_docs, n_tokens, vocab,
             |    CAST(round(log10(n_tokens), 6) AS DECIMAL(18,6)) AS x,
             |    CAST(round(log10(vocab), 6) AS DECIMAL(18,6)) AS y
             |  FROM pts WHERE n_tokens > 0 AND vocab > 0),
             |fit AS (SELECT
             |    round(CAST(m * sxy - sx * sy AS DOUBLE) /
             |      CAST(m * sxx - sx * sx AS DOUBLE), 6) AS beta,
             |    m, sx, sy FROM (SELECT count(*) AS m,
             |      sum(x) AS sx, sum(y) AS sy,
             |      sum(CAST(x * y AS DECIMAL(38,12))) AS sxy,
             |      sum(CAST(x * x AS DECIMAL(38,12))) AS sxx FROM pxy)),
             |fit2 AS (SELECT beta,
             |    round((CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE)) / m, 6)
             |      AS log10_k FROM fit)
             |SELECT ck, n_docs, n_tokens, vocab,
             |  CAST(x AS DOUBLE) AS log10_tokens,
             |  CAST(y AS DOUBLE) AS log10_vocab,
             |  beta, log10_k
             |FROM pxy CROSS JOIN fit2 ORDER BY ck""".stripMargin)),

    // Good-Turing frequency estimation per source (Gale & Sampson 1995
    // "Simple Good-Turing"): the unseen-type mass P0 = n1/N — the
    // probability the NEXT token drawn from this source is a type never
    // seen before — plus the smoothed counts r* = (r+1)·n_{r+1}/n_r for
    // r = 1..4. P0 is the per-source "novelty pressure" a mixture plan
    // reads next to a37's Heaps exponent; a36's KN discount already
    // consumes n1/n2, this exposes the whole low-count spectrum.
    // Scale shape: word-type table (Heaps-bounded) -> count-of-counts
    // (at most max-count rows per source) -> per-source arithmetic.
    Q(
      "a38_good_turing",
      (s, dir) => {
        import s.implicits._
        // types = word trigrams (a37's reason: word vocab saturates)
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"source", TF.tokenize($"text").as("t"))
        val wc = toks.where(size($"t") >= 3)
          .select($"source", explode(expr(
            "transform(sequence(0, size(t)-3), " +
              "i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).as("w"))
          .groupBy($"source", $"w").agg(count(lit(1)).as("r"))
        val coc = wc.groupBy($"source", $"r")
          .agg(count(lit(1)).as("nr"))
        val tot = wc.groupBy($"source")
          .agg(sum($"r").as("big_n"), count(lit(1)).as("n_types"))
        def nrAt(i: Int) =
          sum(when($"r" === i, $"nr").otherwise(0L)).as(s"n$i")
        val piv = coc.groupBy($"source")
          .agg(nrAt(1), nrAt(2), nrAt(3), nrAt(4), nrAt(5))
        piv.join(tot, "source")
          .select($"source", $"big_n", $"n_types",
            $"n1", $"n2", $"n3", $"n4", $"n5",
            round($"n1" / $"big_n".cast("double"), 6).as("p0_unseen"),
            when($"n1" > 0, round(lit(2.0) * $"n2" / $"n1".cast("double"), 6))
              .as("r1_star"),
            when($"n2" > 0, round(lit(3.0) * $"n3" / $"n2".cast("double"), 6))
              .as("r2_star"),
            when($"n3" > 0, round(lit(4.0) * $"n4" / $"n3".cast("double"), 6))
              .as("r3_star"),
            when($"n4" > 0, round(lit(5.0) * $"n5" / $"n4".cast("double"), 6))
              .as("r4_star"))
          .orderBy($"source")
      },
      Some("""WITH tok AS (SELECT source,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS t FROM documents),
             |wc AS (SELECT source, w, count(*) AS r
             |  FROM (SELECT source, unnest(list_transform(range(len(t)-2),
             |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS w
             |    FROM tok WHERE len(t) >= 3)
             |  GROUP BY source, w),
             |coc AS (SELECT source, r, count(*) AS nr FROM wc
             |  GROUP BY source, r),
             |tot AS (SELECT source, CAST(sum(r) AS BIGINT) AS big_n,
             |  count(*) AS n_types FROM wc GROUP BY source),
             |piv AS (SELECT source,
             |  CAST(sum(CASE WHEN r = 1 THEN nr ELSE 0 END) AS BIGINT) AS n1,
             |  CAST(sum(CASE WHEN r = 2 THEN nr ELSE 0 END) AS BIGINT) AS n2,
             |  CAST(sum(CASE WHEN r = 3 THEN nr ELSE 0 END) AS BIGINT) AS n3,
             |  CAST(sum(CASE WHEN r = 4 THEN nr ELSE 0 END) AS BIGINT) AS n4,
             |  CAST(sum(CASE WHEN r = 5 THEN nr ELSE 0 END) AS BIGINT) AS n5
             |  FROM coc GROUP BY source)
             |SELECT p.source, t.big_n, t.n_types, p.n1, p.n2, p.n3, p.n4, p.n5,
             |  round(p.n1 / CAST(t.big_n AS DOUBLE), 6) AS p0_unseen,
             |  CASE WHEN p.n1 > 0
             |    THEN round(2.0 * p.n2 / CAST(p.n1 AS DOUBLE), 6) END AS r1_star,
             |  CASE WHEN p.n2 > 0
             |    THEN round(3.0 * p.n3 / CAST(p.n2 AS DOUBLE), 6) END AS r2_star,
             |  CASE WHEN p.n3 > 0
             |    THEN round(4.0 * p.n4 / CAST(p.n3 AS DOUBLE), 6) END AS r3_star,
             |  CASE WHEN p.n4 > 0
             |    THEN round(5.0 * p.n5 / CAST(p.n4 AS DOUBLE), 6) END AS r4_star
             |FROM piv p JOIN tot t USING (source)
             |ORDER BY p.source""".stripMargin))
  )

  /** Fixed GD round count / learning rate — the oracle replays exactly
    * the [[graft.operators.QualityModel]] configuration (both are
    * compile-time constants, so no object-init-order hazard).
    */
  private final val LrRounds = graft.operators.QualityModel.Rounds
  private final val LrRate = graft.operators.QualityModel.Rate

  /** The DuckDB replay of a29's training run: identical feature
    * projection and centering, then [[LrRounds]] unrolled (residual →
    * DECIMAL gradient → 6dp weight update) rounds, then the same
    * broadcast-model scoring select. Weight columns are
    * (wa, wb, wc, wd) = (bias, f1, f2, f3).
    */
  private[queries] lazy val lrQualityOracle: String = {
    val feat =
      """feat0 AS (SELECT doc_id,
        |  CAST(round(ln(1.0 + CAST(length(text) AS DOUBLE)), 6)
        |    AS DECIMAL(18,6)) AS h1,
        |  CAST(round(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
        |    / greatest(CAST(length(text) AS DOUBLE), 1.0), 6)
        |    AS DECIMAL(18,6)) AS h2,
        |  CAST(round(CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
        |    / greatest(CAST(length(text) AS DOUBLE), 1.0), 6)
        |    AS DECIMAL(18,6)) AS h3,
        |  CAST(CASE WHEN CAST(length(text) AS DOUBLE) >= 150.0
        |      AND CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
        |        / greatest(CAST(length(text) AS DOUBLE), 1.0) <= 0.2
        |    THEN 1 ELSE 0 END AS DECIMAL(18,6)) AS y
        |  FROM documents),
        |nn AS (SELECT count(*) AS cnt FROM feat0),
        |mu AS (SELECT round(CAST(sum(h1) AS DOUBLE)/cnt, 6) AS m1,
        |  round(CAST(sum(h2) AS DOUBLE)/cnt, 6) AS m2,
        |  round(CAST(sum(h3) AS DOUBLE)/cnt, 6) AS m3
        |  FROM feat0 CROSS JOIN nn GROUP BY cnt),
        |feat AS (SELECT doc_id,
        |  CAST(round(CAST(h1 AS DOUBLE) - m1, 6) AS DECIMAL(18,6)) AS f1,
        |  CAST(round(CAST(h2 AS DOUBLE) - m2, 6) AS DECIMAL(18,6)) AS f2,
        |  CAST(round(CAST(h3 AS DOUBLE) - m3, 6) AS DECIMAL(18,6)) AS f3,
        |  y FROM feat0 CROSS JOIN mu),
        |wr0 AS (SELECT CAST(0.0 AS DOUBLE) AS wa, CAST(0.0 AS DOUBLE) AS wb,
        |  CAST(0.0 AS DOUBLE) AS wc, CAST(0.0 AS DOUBLE) AS wd)""".stripMargin
    def sig(p: String) =
      s"1.0/(1.0 + exp(-($p.wa + CAST(f.f1 AS DOUBLE)*$p.wb" +
        s" + CAST(f.f2 AS DOUBLE)*$p.wc + CAST(f.f3 AS DOUBLE)*$p.wd)))"
    val rounds = (1 to LrRounds).map { k =>
      s"""rs$k AS (SELECT CAST(round(${sig("w")}, 6) AS DECIMAL(18,6)) - f.y
         |    AS r, f.f1, f.f2, f.f3
         |  FROM feat f CROSS JOIN wr${k - 1} w),
         |gr$k AS (SELECT sum(r) AS s0, sum(r*f1) AS s1, sum(r*f2) AS s2,
         |    sum(r*f3) AS s3 FROM rs$k),
         |wr$k AS (SELECT
         |    round(w.wa - $LrRate*CAST(g.s0 AS DOUBLE)/nn.cnt, 6) AS wa,
         |    round(w.wb - $LrRate*CAST(g.s1 AS DOUBLE)/nn.cnt, 6) AS wb,
         |    round(w.wc - $LrRate*CAST(g.s2 AS DOUBLE)/nn.cnt, 6) AS wc,
         |    round(w.wd - $LrRate*CAST(g.s3 AS DOUBLE)/nn.cnt, 6) AS wd
         |  FROM wr${k - 1} w CROSS JOIN gr$k g CROSS JOIN nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH $feat,
       |$rounds
       |SELECT doc_id, label, score, score >= 0.5 AS pred FROM (
       |  SELECT f.doc_id, CAST(f.y AS INTEGER) AS label,
       |    round(${sig("w")}, 6) AS score
       |  FROM feat f CROSS JOIN wr$LrRounds w)
       |ORDER BY doc_id""".stripMargin
  }

  /** a24/a27's per-document bigram-LM chain: train the add-1-smoothed
    * bigram LM on the corpus (vocabulary-broadcast unigram table +
    * bigram-key hash join), score every >=2-token doc by its mean
    * -log10 bigram probability. Columns: (doc_id, n_bigrams, surprisal).
    */
  private[queries] def lmSurprisalPerDoc(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val toks = graft.Par.fanOut(Tables.documents(s, dir))
      .select($"doc_id", TF.tokenize($"text").as("t"))
    val uni = toks.select(explode($"t").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("vocab"))
    val bi = toks.where(size($"t") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))"))
        .as("bg"))
      .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    // NOT persisted, deliberately: bi feeds both the count table and the
    // scoring probe, but it is the CORPUS-SIZED exploded stream —
    // materializing it costs more than replaying the columnar scan
    // (measured: persist doubled the sf0.1 wall time). The Bm25/d15
    // persists win because those tables are query- or df-bounded.
    val bic = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("cb"))
    bi
      .join(bic, Seq("w1", "w2"))
      .join(broadcast(uni.withColumnRenamed("w", "w1")), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("nlp",
        round(-log10(($"cb" + lit(1.0)) / ($"c1" + $"vocab")), 6)
          .cast("decimal(18,6)"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        // exact decimal mean, rounded half-up in INTEGER micro-units:
        // each nlp is an exact 6-dp decimal, so sum*1e6 is an exact
        // long and (2*sm + n) DIV (2*n) is round-half-up(sm/n) — the
        // old round(double_sum/n, 6) differed from DuckDB by 1 ulp
        // when the quotient sat exactly on a 5e-7 boundary (sf0.1 a24)
        sum(($"nlp" * 1000000).cast("long")).as("sm"))
      .select($"doc_id", $"n_bigrams",
        (expr("(2*sm + n_bigrams) DIV (2*n_bigrams)").cast("double")
          / 1e6).as("surprisal"))
  }

  /** The DuckDB replay of [[lmSurprisalPerDoc]], ending in `pd`
    * (doc_id, n_bigrams, surprisal) — shared by a24 and a27.
    */
  private[queries] lazy val lmSurprisalCtes: String =
    """base AS (SELECT doc_id,
      |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS t FROM documents),
      |u AS (SELECT w, count(*) AS c1
      |  FROM (SELECT unnest(t) AS w FROM base) GROUP BY w),
      |v AS (SELECT count(*) AS vocab FROM u),
      |bg AS (SELECT doc_id, unnest(list_transform(range(len(t)-1),
      |    i -> struct_pack(w1 := t[i+1], w2 := t[i+2]))) AS g
      |  FROM base WHERE len(t) >= 2),
      |bg2 AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM bg),
      |bc AS (SELECT w1, w2, count(*) AS cb FROM bg2 GROUP BY w1, w2),
      |sc AS (SELECT doc_id,
      |    CAST(round(-log10((cb + 1.0) / (c1 + vocab)), 6)
      |      AS DECIMAL(18,6)) AS nlp
      |  FROM bg2 JOIN bc USING (w1, w2) JOIN u ON bg2.w1 = u.w
      |  CROSS JOIN v),
      |pd AS (SELECT doc_id, count(*) AS n_bigrams,
      |    ((2 * CAST(sum(CAST(nlp * 1000000 AS BIGINT)) AS BIGINT)
      |      + count(*)) // (2 * count(*))) / 1000000.0 AS surprisal
      |  FROM sc GROUP BY doc_id)""".stripMargin

  /** mm03's byte-exact frame chain (`b, by2, fr, sl, hs` — hs holds
    * (id, modality, frame_idx, frame_bytes, unsigned FNV h)), shared
    * with mm06's shared-frame grouping.
    */
  private lazy val frameHashCtes: String = frameHashCtesFor(256, 4)

  /** Parametrized frame chain (mm07 uses 64-byte frames, stride 1, so
    * the fixture's short payloads still yield multi-frame media).
    */
  private def frameHashCtesFor(frameBytes: Int, stride: Int): String =
    s"""b AS (
       |  SELECT doc_id AS id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |      ELSE 'video' END AS modality,
       |    hex(encode(coalesce(text,''))) AS hx,
       |    octet_length(encode(coalesce(text,''))) AS n
       |  FROM documents),
       |by2 AS (
       |  SELECT id, modality, n,
       |    list_transform(range(n), i ->
       |      ((strpos('0123456789ABCDEF', hx[2*i+1])-1)*16 +
       |       (strpos('0123456789ABCDEF', hx[2*i+2])-1))::HUGEINT) AS bytes
       |  FROM b),
       |fr AS (
       |  SELECT id, modality, bytes, n,
       |    unnest(range(0, (n + ${frameBytes - 1}) // $frameBytes, $stride))
       |      AS frame_idx
       |  FROM by2),
       |sl AS (
       |  SELECT id, modality, frame_idx,
       |    bytes[(frame_idx*$frameBytes+1):least((frame_idx+1)*$frameBytes, n)]
       |      AS fb
       |  FROM fr),
       |hs AS (
       |  SELECT id, modality, frame_idx, len(fb) AS frame_bytes,
       |    list_reduce(list_prepend(14695981039346656037::HUGEINT, fb),
       |      ${FnvSql.fold}) AS h
       |  FROM sl)""".stripMargin

  /** mm04 oracle: the 60-term dHash gradient sum over the recovered
    * payload bytes (missing bytes read 0), then an all-pairs Hamming
    * filter — equivalent to the Spark plan's banded join because 4
    * bands give complete recall at Hamming ≤ 3 (pigeonhole).
    */
  /** mm12: the mm04 candidate chain + the mm08 grid chain (prefixed
    * g*) + per-pair SSIM stats. Grid cell values are round-6 means, so
    * the DECIMAL(38,12) pair sums are exact; the SSIM formula is
    * spelled in the identical operation order on both engines.
    */
  private lazy val mm12OracleSql: String = {
    val dhTerms = (0 until 60).map(i =>
      s"(CASE WHEN coalesce(bytes[${i + 2}], 0) > coalesce(bytes[${i + 1}], 0)" +
        s" THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH b AS (SELECT doc_id AS id, hex(encode(coalesce(text,''))) AS hx,
       |  octet_length(encode(coalesce(text,''))) AS n FROM documents),
       |by2 AS (SELECT id, list_transform(range(n), i ->
       |    (strpos('0123456789ABCDEF', hx[2*i+1])-1)*16 +
       |    (strpos('0123456789ABCDEF', hx[2*i+2])-1)) AS bytes FROM b),
       |dh AS (SELECT id, CAST($dhTerms AS BIGINT) AS dhash FROM by2),
       |p AS (SELECT a.id AS a, b.id AS b
       |  FROM dh a JOIN dh b ON a.id < b.id
       |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 3),
       |gby2 AS (SELECT id, greatest(1, (n + 31) // 32) AS h,
       |    list_concat(
       |      list_transform(range(n), i ->
       |        (strpos('0123456789ABCDEF', hx[2*i+1])-1)*16 +
       |        (strpos('0123456789ABCDEF', hx[2*i+2])-1)),
       |      list_transform(range(greatest(1, (n + 31) // 32) * 32 - n),
       |        i -> 0)) AS px
       |  FROM b),
       |gpxr AS (SELECT id, h, unnest(range(h * 32)) AS pp, unnest(px) AS v
       |  FROM gby2),
       |gagg AS (SELECT id,
       |  ((pp // 32) * 8 // h) * 8 + (pp % 32) // 4 AS cell,
       |  round(sum(v) * 1.0 / count(*), 6) AS av
       |  FROM gpxr GROUP BY id, ((pp // 32) * 8 // h) * 8 + (pp % 32) // 4),
       |grid AS (SELECT s.id, CAST(s.cell AS INTEGER) AS cell,
       |  coalesce(a.av, 0.0) AS v
       |  FROM (SELECT id, unnest(range(64)) AS cell FROM b) s
       |  LEFT JOIN gagg a ON a.id = s.id AND a.cell = s.cell),
       |st AS (SELECT p.a, p.b,
       |  CAST(sum(CAST(gx.v AS DECIMAL(38,12))) AS DOUBLE) / 64 AS mux,
       |  CAST(sum(CAST(gy.v AS DECIMAL(38,12))) AS DOUBLE) / 64 AS muy,
       |  CAST(sum(CAST(gx.v * gx.v AS DECIMAL(38,12))) AS DOUBLE) / 64 AS sxx,
       |  CAST(sum(CAST(gy.v * gy.v AS DECIMAL(38,12))) AS DOUBLE) / 64 AS syy,
       |  CAST(sum(CAST(gx.v * gy.v AS DECIMAL(38,12))) AS DOUBLE) / 64 AS sxy
       |  FROM p JOIN grid gx ON gx.id = p.a
       |  JOIN grid gy ON gy.id = p.b AND gy.cell = gx.cell
       |  GROUP BY p.a, p.b)
       |SELECT a, b, round(
       |  ((2 * mux * muy + 6.5025) * (2 * (sxy - mux * muy) + 58.5225))
       |  / ((mux * mux + muy * muy + 6.5025)
       |     * ((sxx - mux * mux) + (syy - muy * muy) + 58.5225)), 6)
       |  AS ssim
       |FROM st ORDER BY a, b""".stripMargin
  }

  private lazy val mm04OracleSql: String = {
    val dhTerms = (0 until 60).map(i =>
      s"(CASE WHEN coalesce(bytes[${i + 2}], 0) > coalesce(bytes[${i + 1}], 0)" +
        s" THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH b AS (SELECT doc_id AS id, hex(encode(coalesce(text,''))) AS hx,
       |  octet_length(encode(coalesce(text,''))) AS n FROM documents),
       |by2 AS (SELECT id, list_transform(range(n), i ->
       |    (strpos('0123456789ABCDEF', hx[2*i+1])-1)*16 +
       |    (strpos('0123456789ABCDEF', hx[2*i+2])-1)) AS bytes FROM b),
       |dh AS (SELECT id, CAST($dhTerms AS BIGINT) AS dhash FROM by2),
       |p AS (SELECT a.id AS a, b.id AS b,
       |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
       |  FROM dh a JOIN dh b ON a.id < b.id)
       |SELECT a, b, hamming FROM p WHERE hamming <= 3 ORDER BY a, b""".stripMargin
  }
}
