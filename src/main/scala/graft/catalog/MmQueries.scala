package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Transforms
import graft.incr.Incremental
import graft.meta.ColumnSpec
import graft.ops.{Dedup, Graph, Multimodal, Recon, Sampling, Similarity, TextOps}
import graft.pipeline.StageTransform
import graft.write.MergeWriter
import graft.catalog.Shared._
import graft.catalog.DslQueries._
import graft.catalog.PipelineQueries._
import graft.catalog.RelationalQueries._
import graft.catalog.TextQueries._
import graft.catalog.DedupQueries._
import graft.catalog.SimQueries._

/** multimodal (image/audio/video) queries — split from the single-object catalog;
  * content unchanged. Assembled by [[graft.QueryCatalog]]. */
private[graft] object MmQueries {
  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Spectral acoustic fingerprint (Multimodal.audioSpectralHash) over
    // REAL decoded WAV bytes: per 32-sample frame an exact-integer 4-bin
    // DFT power, dominant bin -> 2-bit symbol, 32 frames packed into one
    // BIGINT — the frequency-domain complement of the energy hash
    // (amplitude-invariant by argmax). Oracle replays samples AND the
    // full transform from the shared fixed-point basis.
    ("q_mm_audio_spectral",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val wavs = scanFloor(t(s, d, "documents").select("doc_id")).as[Long]
          .map(id => (id, Multimodal.syntheticWavFamily(id, 16000)))
        Multimodal.audioSpectralHash(wavs).toDF()
          .select(col("media_id"), col("shash"))
      },
      Some(mmSpectralSigSql + "\nSELECT media_id, shash FROM ssig")),

    // Acoustic fingerprinting over REAL decoded WAV bytes, full oracle —
    // the audio twin of q_mm_ahash: Spark writes and codec-decodes every
    // clip; DuckDB replays the samples from the integer formula
    ("q_mm_audio_hash",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val wavs = scanFloor(t(s, d, "documents").select("doc_id")).as[Long]
          .map(id => (id, Multimodal.syntheticWavFamily(id, 16000)))
        Multimodal.audioEnergyHash(wavs).toDF()
          .select(col("media_id"), col("ehash"))
      },
      Some(mmAudioSigSql + "\nSELECT media_id, ehash FROM asig")),

    // corpus-wide acoustic near-dup pairs through the shared Manku blocked
    // search — must equal the oracle's brute-force hamming join.
    // maxBucket=0 (uncapped) PINNED DELIBERATELY (oracle-exactness pin):
    // the row proves the blocked search equals the brute-force join, which
    // needs every pair kept (output grew x99.6 at sf1 while wall/pair fell
    // to 0.26x — output-driven, not algorithmic). The production path at
    // scale is the SAME call with maxBucket > 0 (deterministic md5-rank
    // bucket cap), exercised by the capped dedup rows.
    ("q_mm_audio_pairs",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val wavs = scanFloor(t(s, d, "documents").select("doc_id")).as[Long]
          .map(id => (id, Multimodal.syntheticWavFamily(id, 16000)))
        Dedup.hammingNearDups(
          Multimodal.audioEnergyHash(wavs).toDF()
            .select(col("media_id").as("doc_id"), col("ehash").as("simhash")),
          bits = 64, maxHamming = 3, blocks = 6, maxBucket = 0)
      },
      Some(s"""$mmAudioSigSql
        SELECT a.media_id AS doc1, b.media_id AS doc2,
          CAST(bit_count(xor(a.ehash, b.ehash)) AS BIGINT) AS hamming
        FROM asig a JOIN asig b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.ehash, b.ehash)) <= 3""")),

    // Energy-threshold VAD segmentation (Multimodal.audioActivity) over
    // REAL decoded WAV bytes: active = frame energy strictly above the
    // clip mean (amplitude-invariant), segments = maximal active runs,
    // run-length scan inside the per-clip map (no shuffle). Oracle
    // replays samples, the 65-frame energies, and the gaps-and-islands
    // run arithmetic from the integer formula.
    ("q_mm_audio_vad",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val wavs = scanFloor(t(s, d, "documents").select("doc_id")).as[Long]
          .map(id => (id, Multimodal.syntheticWavFamily(id, 16000)))
        Multimodal.audioActivity(wavs).toDF()
      },
      Some("""WITH r2080 AS (SELECT unnest(range(0, 2080)) AS i),
        p AS (SELECT doc_id, 6000 + (doc_id // 10 % 50) * 50 AS amp,
            32 + (doc_id // 10 % 5) * 16 AS per, doc_id // 10 % 97 AS phase,
            (doc_id % 61) * 32 AS cut0
          FROM documents),
        smp AS (SELECT p.doc_id, r.i,
            CASE WHEN r.i >= cut0 AND r.i < cut0 + 64 THEN 0
                 ELSE (CASE WHEN (r.i + phase) % per < per // 2
                            THEN (r.i + phase) % per
                            ELSE per - (r.i + phase) % per END) * 2 * amp
                      // per
                      * (CASE WHEN ((r.i + phase) // per) % 2 = 0
                              THEN 1 ELSE -1 END)
            END AS s
          FROM p CROSS JOIN r2080 r),
        frm AS (SELECT doc_id, i // 32 AS f, sum(abs(s)) AS e
          FROM smp GROUP BY 1, 2),
        tote AS (SELECT doc_id, sum(e) AS tot FROM frm GROUP BY 1),
        act AS (SELECT frm.doc_id, f, e,
            CASE WHEN e * 65 > tot THEN 1 ELSE 0 END AS a
          FROM frm JOIN tote USING (doc_id)),
        isl AS (SELECT doc_id, f, a,
            f - row_number() OVER (PARTITION BY doc_id, a ORDER BY f)
              AS grp
          FROM act),
        runs AS (SELECT doc_id, count(*) AS len FROM isl WHERE a = 1
          GROUP BY doc_id, grp),
        seg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
            CAST(max(len) AS BIGINT) AS longest_run FROM runs GROUP BY 1)
        SELECT tote.doc_id AS media_id, CAST(65 AS BIGINT) AS n_frames,
          na.n_active, coalesce(seg.n_segments, 0) AS n_segments,
          coalesce(seg.longest_run, 0) AS longest_run,
          CAST(tote.tot AS BIGINT) AS total_energy
        FROM tote
        JOIN (SELECT doc_id, CAST(sum(a) AS BIGINT) AS n_active FROM act
          GROUP BY 1) na USING (doc_id)
        LEFT JOIN seg USING (doc_id)""")),

    // Shot-boundary detection (Multimodal.sceneCuts): every 'video' doc
    // gets 12 REAL-codec frames (4-frame shots — the frame pattern seed
    // advances every 4 frames), aHash per frame in the scan stage, cut =
    // consecutive hamming strictly > 16 bits. Oracle replays the frame
    // pixels (seed fid = (doc_id*4 + k/4)*10), the hash, and the lag
    // arithmetic with no codec.
    ("q_mm_scene_cuts",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val frames = scanFloor(t(s, d, "documents").select(col("doc_id")))
          .where(col("doc_id") % 3 === 2)
          .select(col("doc_id"), explode(expr("sequence(0, 11)")).as("k"))
          .as[(Long, Int)]
          .map { case (id, k) =>
            (id, k,
              Multimodal.syntheticPngFamily((id * 4 + k / 4) * 10, 32, 24)) }
        Multimodal.sceneCuts(frames, threshold = 16)
      },
      Some("""WITH g8 AS (SELECT unnest(range(0, 8)) AS i),
        fr AS (SELECT doc_id AS media_id, unnest(range(0, 12)) AS k
          FROM documents WHERE doc_id % 3 = 2),
        fid AS (SELECT media_id, k, (media_id * 4 + k // 4) * 10 AS fv
          FROM fr),
        cell AS (SELECT media_id, k, fv, cy.i * 8 + cx.i AS bit,
            cx.i * 32 // 8 AS sx, cy.i * 24 // 8 AS sy
          FROM fid CROSS JOIN g8 cx CROSS JOIN g8 cy),
        lum AS (SELECT media_id, k, bit,
            (((sx * 255 // 31 + (fv // 10 % 7) * 36) % 256) * 299 +
             ((sy * 255 // 23 + (fv // 10 % 11) * 23) % 256) * 587 +
             (CASE WHEN sy = fv % 24
                   THEN 255 - ((sx + sy + fv // 10) % 8) * 32
                   ELSE ((sx + sy + fv // 10) % 8) * 32 END) * 114)
              // 1000 AS l
          FROM cell),
        tot AS (SELECT media_id, k, sum(l) AS t FROM lum GROUP BY 1, 2),
        acc AS (SELECT lum.media_id, lum.k,
            sum(CASE WHEN lum.l * 64 > tot.t THEN 1::HUGEINT << lum.bit
                     ELSE 0::HUGEINT END) AS h
          FROM lum JOIN tot USING (media_id, k) GROUP BY 1, 2),
        sig AS (SELECT media_id, k,
            CAST(CASE WHEN h >= 1::HUGEINT << 63 THEN h - (1::HUGEINT << 64)
                      ELSE h END AS BIGINT) AS ahash
          FROM acc),
        stp AS (SELECT media_id, k,
            bit_count(xor(ahash, lag(ahash) OVER (PARTITION BY media_id
              ORDER BY k))) AS ham
          FROM sig)
        SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
          CAST(sum(CASE WHEN ham > 16 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_cuts,
          CAST(coalesce(sum(CASE WHEN ham > 16 THEN ham END), 0) AS BIGINT)
            AS sum_cut_hamming,
          CAST(coalesce(max(ham), 0) AS BIGINT) AS max_hamming
        FROM stp GROUP BY 1""")),

    // Keyframe selection (Multimodal.keyframes): the caption-one-frame-
    // per-shot preprocessing — scenes segmented at aHash steps (> 16
    // bits, the q_mm_scene_cuts rule), each scene represented by its
    // SHARPEST frame (argmax interior-Laplacian energy, ties to the
    // earliest index). ONE real-codec decode per frame feeds both the
    // hash and the stencil. The oracle composes the scene-cut replay
    // (pixels → hash → lag/cuts → running scene id) with the sharpness
    // replay (4 grid-shifted self-joins) and the deterministic pick.
    ("q_mm_keyframes",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val frames = scanFloor(t(s, d, "documents").select(col("doc_id")))
          .where(col("doc_id") % 3 === 2)
          .select(col("doc_id"), explode(expr("sequence(0, 11)")).as("k"))
          .as[(Long, Int)]
          .map { case (id, k) =>
            (id, k,
              Multimodal.syntheticPngFamily((id * 4 + k / 4) * 10, 32, 24)) }
        Multimodal.keyframes(frames, threshold = 16)
      },
      Some("""WITH g8 AS (SELECT unnest(range(0, 8)) AS i),
        fr AS (SELECT doc_id AS media_id, unnest(range(0, 12)) AS k
          FROM documents WHERE doc_id % 3 = 2),
        fid AS (SELECT media_id, k, (media_id * 4 + k // 4) * 10 AS fv
          FROM fr),
        cell AS (SELECT media_id, k, fv, cx.i AS gx, cy.i AS gy,
            cy.i * 8 + cx.i AS bit,
            cx.i * 32 // 8 AS sx, cy.i * 24 // 8 AS sy
          FROM fid CROSS JOIN g8 cx CROSS JOIN g8 cy),
        lum AS (SELECT media_id, k, gx, gy, bit,
            (((sx * 255 // 31 + (fv // 10 % 7) * 36) % 256) * 299 +
             ((sy * 255 // 23 + (fv // 10 % 11) * 23) % 256) * 587 +
             (CASE WHEN sy = fv % 24
                   THEN 255 - ((sx + sy + fv // 10) % 8) * 32
                   ELSE ((sx + sy + fv // 10) % 8) * 32 END) * 114)
              // 1000 AS l
          FROM cell),
        tot AS (SELECT media_id, k, sum(l) AS t FROM lum GROUP BY 1, 2),
        acc AS (SELECT lum.media_id, lum.k,
            sum(CASE WHEN lum.l * 64 > tot.t THEN 1::HUGEINT << lum.bit
                     ELSE 0::HUGEINT END) AS h
          FROM lum JOIN tot USING (media_id, k) GROUP BY 1, 2),
        sig AS (SELECT media_id, k,
            CAST(CASE WHEN h >= 1::HUGEINT << 63 THEN h - (1::HUGEINT << 64)
                      ELSE h END AS BIGINT) AS ahash
          FROM acc),
        shp AS (SELECT c.media_id, c.k,
            CAST(sum(abs(4 * c.l - lw.l - le.l - ln.l - ls.l)) AS BIGINT)
              AS sharp
          FROM lum c
          JOIN lum lw ON lw.media_id = c.media_id AND lw.k = c.k
            AND lw.gx = c.gx - 1 AND lw.gy = c.gy
          JOIN lum le ON le.media_id = c.media_id AND le.k = c.k
            AND le.gx = c.gx + 1 AND le.gy = c.gy
          JOIN lum ln ON ln.media_id = c.media_id AND ln.k = c.k
            AND ln.gx = c.gx AND ln.gy = c.gy - 1
          JOIN lum ls ON ls.media_id = c.media_id AND ls.k = c.k
            AND ls.gx = c.gx AND ls.gy = c.gy + 1
          WHERE c.gx BETWEEN 1 AND 6 AND c.gy BETWEEN 1 AND 6
          GROUP BY 1, 2),
        stp AS (SELECT media_id, k,
            CASE WHEN bit_count(xor(ahash,
                lag(ahash) OVER (PARTITION BY media_id ORDER BY k))) > 16
              THEN 1 ELSE 0 END AS cut
          FROM sig),
        scn AS (SELECT media_id, k,
            sum(cut) OVER (PARTITION BY media_id ORDER BY k) AS scene_id
          FROM stp),
        jn AS (SELECT scn.media_id, CAST(scn.scene_id AS BIGINT)
              AS scene_id, scn.k, shp.sharp,
            row_number() OVER (PARTITION BY scn.media_id, scn.scene_id
              ORDER BY shp.sharp DESC, scn.k ASC) AS rn,
            count(*) OVER (PARTITION BY scn.media_id, scn.scene_id)
              AS n_frames
          FROM scn JOIN shp ON scn.media_id = shp.media_id
            AND scn.k = shp.k)
        SELECT media_id, scene_id, CAST(n_frames AS BIGINT) AS n_frames,
          CAST(k AS BIGINT) AS keyframe_idx, sharp AS sharpness
        FROM jn WHERE rn = 1""")),

    // Video CONTAINER demux end-to-end (Multimodal.demuxFrames): every
    // 'video' doc is packed into a REAL RIFF-AVI container (hdrl/movi/idx1,
    // word-aligned '00dc' chunks) holding the same 12 real-codec frames as
    // q_mm_scene_cuts; the RIFF chunk walker demuxes container bytes back
    // into the frame table and sceneCuts runs on it. Frame payloads are
    // PNG (lossless) so the oracle replays pixels/hash/lag arithmetic with
    // no codec — MJPEG payloads ride the identical demux+imageio path and
    // are spec-pinned (AviSpec) since JPEG is lossy. The container stub is
    // retired: these are real container bytes, parsed for real.
    ("q_mm_demux",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val clips = scanFloor(t(s, d, "documents").select(col("doc_id")))
          .where(col("doc_id") % 3 === 2)
          .as[Long]
          .map { id =>
            val frames = (0 until 12).map(k =>
              Multimodal.syntheticPngFamily((id * 4 + k / 4) * 10, 32, 24))
            (id, Multimodal.syntheticAvi(frames, 32, 24, fourcc = "MJPG"))
          }
        Multimodal.sceneCuts(Multimodal.demuxFrames(clips), threshold = 16)
      },
      Some("""WITH g8 AS (SELECT unnest(range(0, 8)) AS i),
        fr AS (SELECT doc_id AS media_id, unnest(range(0, 12)) AS k
          FROM documents WHERE doc_id % 3 = 2),
        fid AS (SELECT media_id, k, (media_id * 4 + k // 4) * 10 AS fv
          FROM fr),
        cell AS (SELECT media_id, k, fv, cy.i * 8 + cx.i AS bit,
            cx.i * 32 // 8 AS sx, cy.i * 24 // 8 AS sy
          FROM fid CROSS JOIN g8 cx CROSS JOIN g8 cy),
        lum AS (SELECT media_id, k, bit,
            (((sx * 255 // 31 + (fv // 10 % 7) * 36) % 256) * 299 +
             ((sy * 255 // 23 + (fv // 10 % 11) * 23) % 256) * 587 +
             (CASE WHEN sy = fv % 24
                   THEN 255 - ((sx + sy + fv // 10) % 8) * 32
                   ELSE ((sx + sy + fv // 10) % 8) * 32 END) * 114)
              // 1000 AS l
          FROM cell),
        tot AS (SELECT media_id, k, sum(l) AS t FROM lum GROUP BY 1, 2),
        acc AS (SELECT lum.media_id, lum.k,
            sum(CASE WHEN lum.l * 64 > tot.t THEN 1::HUGEINT << lum.bit
                     ELSE 0::HUGEINT END) AS h
          FROM lum JOIN tot USING (media_id, k) GROUP BY 1, 2),
        sig AS (SELECT media_id, k,
            CAST(CASE WHEN h >= 1::HUGEINT << 63 THEN h - (1::HUGEINT << 64)
                      ELSE h END AS BIGINT) AS ahash
          FROM acc),
        stp AS (SELECT media_id, k,
            bit_count(xor(ahash, lag(ahash) OVER (PARTITION BY media_id
              ORDER BY k))) AS ham
          FROM sig)
        SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
          CAST(sum(CASE WHEN ham > 16 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_cuts,
          CAST(coalesce(sum(CASE WHEN ham > 16 THEN ham END), 0) AS BIGINT)
            AS sum_cut_hamming,
          CAST(coalesce(max(ham), 0) AS BIGINT) AS max_hamming
        FROM stp GROUP BY 1""")),

    // REAL codec round trip (rows-only: DuckDB cannot decode PNG): build
    // deterministic compressed PNGs in the executors, resize 32x24 -> 8x6
    // nearest-neighbor, decode with javax.imageio, emit exact pixel sums.
    // doc_id drives the pattern so the distributed build is reproducible
    // Perceptual image hashing over REAL decoded PNG bytes — with a FULL
    // oracle: the family-pattern pixels are pure integer arithmetic of
    // (x, y, id) and PNG is lossless, so DuckDB replays the decoded 8x8
    // luma grid (sx = x*32//8, sy = y*24//8) and the strict-majority bit
    // rule from the formula, no codec needed. Spark actually encodes and
    // decodes every image (javax.imageio) — the codec path is exercised,
    // the values are engine-checkable. Sign bit via HUGEINT wrap.
    ("q_mm_ahash",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val pngs = scanFloor(t(s, d, "documents").select("doc_id")).as[Long]
          .map(id => (id, Multimodal.syntheticPngFamily(id, 32, 24)))
        Multimodal.imageAHash(pngs).toDF()
          .select(col("media_id"), col("ahash"))
      },
      Some(mmAhashSigSql + "\nSELECT media_id, ahash FROM sig")),

    // corpus-wide perceptual near-dup pairs: the 64-bit aHash through the
    // same Manku blocked search as text simhash (exact recall at
    // maxHamming < blocks) — must equal the oracle's brute-force hamming
    // join over the replayed signatures
    ("q_mm_ahash_pairs",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val pngs = scanFloor(t(s, d, "documents").select("doc_id")).as[Long]
          .map(id => (id, Multimodal.syntheticPngFamily(id, 32, 24)))
        Dedup.hammingNearDups(
          Multimodal.imageAHash(pngs).toDF()
            .select(col("media_id").as("doc_id"), col("ahash").as("simhash")),
          bits = 64, maxHamming = 3, blocks = 6, maxBucket = 0)
      },
      Some(s"""$mmAhashSigSql
        SELECT a.media_id AS doc1, b.media_id AS doc2,
          CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
        FROM sig a JOIN sig b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.ahash, b.ahash)) <= 3""")),

    // Whole-bit luminance entropy (Multimodal.imageEntropy) — the
    // flat-image / screenshot quality gate: Σ c·(bits(64) − bits(c)) over
    // the 8x8 luma sample, exact integers (the image-space twin of the
    // surprisal trick). Oracle replays pixels + the bit arithmetic.
    ("q_mm_entropy",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val pngs = scanFloor(t(s, d, "documents").select("doc_id")).as[Long]
          .map(id => (id, Multimodal.syntheticPngFamily(id, 32, 24)))
        Multimodal.imageEntropy(pngs).toDF()
      },
      Some("""WITH g8 AS (SELECT unnest(range(0, 8)) AS i),
        cell AS (SELECT d.doc_id, cx.i * 32 // 8 AS sx, cy.i * 24 // 8 AS sy
          FROM documents d CROSS JOIN g8 cx CROSS JOIN g8 cy),
        lum AS (SELECT doc_id,
            (((sx * 255 // 31 + (doc_id // 10 % 7) * 36) % 256) * 299 +
             ((sy * 255 // 23 + (doc_id // 10 % 11) * 23) % 256) * 587 +
             (CASE WHEN sy = doc_id % 24
                   THEN 255 - ((sx + sy + doc_id // 10) % 8) * 32
                   ELSE ((sx + sy + doc_id // 10) % 8) * 32 END) * 114)
              // 1000 AS l
          FROM cell),
        cnt AS (SELECT doc_id, l, count(*) AS c FROM lum GROUP BY 1, 2)
        SELECT doc_id AS media_id, CAST(count(*) AS BIGINT) AS n_levels,
          CAST(sum(c * (length(bin(64)) - length(bin(c)))) AS BIGINT)
            AS entropy_bits_x64
        FROM cnt GROUP BY doc_id""")),

    // Laplacian blur gate (Multimodal.imageSharpness): exact-integer
    // 4-neighbour Laplacian over the 8x8 decoded-luma grid, interior sum
    // + max. Oracle rebuilds the pixels and the stencil via four
    // grid-shifted self-joins.
    ("q_mm_sharpness",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val pngs = scanFloor(t(s, d, "documents").select("doc_id")).as[Long]
          .map(id => (id, Multimodal.syntheticPngFamily(id, 32, 24)))
        Multimodal.imageSharpness(pngs).toDF()
      },
      Some("""WITH g8 AS (SELECT unnest(range(0, 8)) AS i),
        cell AS (SELECT d.doc_id, cx.i AS gx, cy.i AS gy,
            cx.i * 32 // 8 AS sx, cy.i * 24 // 8 AS sy
          FROM documents d CROSS JOIN g8 cx CROSS JOIN g8 cy),
        lum AS (SELECT doc_id, gx, gy,
            (((sx * 255 // 31 + (doc_id // 10 % 7) * 36) % 256) * 299 +
             ((sy * 255 // 23 + (doc_id // 10 % 11) * 23) % 256) * 587 +
             (CASE WHEN sy = doc_id % 24
                   THEN 255 - ((sx + sy + doc_id // 10) % 8) * 32
                   ELSE ((sx + sy + doc_id // 10) % 8) * 32 END) * 114)
              // 1000 AS l
          FROM cell),
        lap AS (SELECT c.doc_id,
            abs(4 * c.l - lw.l - le.l - ln.l - ls.l) AS v
          FROM lum c
          JOIN lum lw ON lw.doc_id = c.doc_id AND lw.gx = c.gx - 1
            AND lw.gy = c.gy
          JOIN lum le ON le.doc_id = c.doc_id AND le.gx = c.gx + 1
            AND le.gy = c.gy
          JOIN lum ln ON ln.doc_id = c.doc_id AND ln.gx = c.gx
            AND ln.gy = c.gy - 1
          JOIN lum ls ON ls.doc_id = c.doc_id AND ls.gx = c.gx
            AND ls.gy = c.gy + 1
          WHERE c.gx BETWEEN 1 AND 6 AND c.gy BETWEEN 1 AND 6)
        SELECT doc_id AS media_id, CAST(sum(v) AS BIGINT) AS sharpness,
          CAST(max(v) AS BIGINT) AS lap_max
        FROM lap GROUP BY 1""")),

    // DCT perceptual hash (Multimodal.imagePHash) over the REAL decoded
    // PNGs: exact-integer 8x8 DCT-II (fixed-point basis shared with the
    // oracle as literals), bits = AC coefficient vs the 32nd-smallest-
    // of-63 order-statistic median. Spectral-shape dedup where aHash is
    // luminance-threshold dedup — catches brightness/contrast-shifted
    // duplicates. Oracle rebuilds pixels from first principles and
    // replays the full transform.
    ("q_mm_phash",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val pngs = scanFloor(t(s, d, "documents").select("doc_id")).as[Long]
          .map(id => (id, Multimodal.syntheticPngFamily(id, 32, 24)))
        Multimodal.imagePHash(pngs).toDF()
          .select(col("media_id"), col("phash"))
      },
      Some(mmPhashSigSql + "\nSELECT media_id, phash FROM psig")),

    // Per-tile perceptual signatures (2x2 tiles, 16-bit hashes) over the
    // REAL decoded PNGs — the partial-overlap index; oracle rebuilds the
    // pixels from first principles
    ("q_mm_tiles",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val pngs = scanFloor(t(s, d, "documents").select("doc_id")).as[Long]
          .map(id => (id, Multimodal.syntheticPngFamily(id, 32, 24)))
        Multimodal.imageTileHash(pngs).toDF()
      },
      Some(s"""$mmTileSigSql
        SELECT doc_id AS media_id, CAST(tile AS INTEGER) AS tile, thash
        FROM acc""")),

    // Partial-overlap pairs: images sharing >= 2 RARE tile hashes (tile
    // document frequency <= 8 — flat/boilerplate tiles are the image-
    // space hot shingles and are excluded exactly like text dedup's hot
    // grams). Catches collage/crop reuse that whole-image hamming misses.
    ("q_mm_tile_pairs",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val pngs = scanFloor(t(s, d, "documents").select("doc_id")).as[Long]
          .map(id => (id, Multimodal.syntheticPngFamily(id, 32, 24)))
        // persisted: rare-filter, posting join and self-join all reference
        // this subtree, and each re-execution would re-encode + re-decode
        // every PNG (codec CPU dominates — the opposite tradeoff from
        // ppjoin's cheap codegen'd prefix subtree, where a persist LOST)
        val th = Multimodal.imageTileHash(pngs).toDF()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rare = th.groupBy("tile", "thash")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2 && col("df") <= 8)
          .select("tile", "thash")
        val ra = th.join(rare, Seq("tile", "thash"))
        ra.as("a").join(ra.as("b"),
            col("a.tile") === col("b.tile") &&
              col("a.thash") === col("b.thash") &&
              col("a.media_id") < col("b.media_id"))
          .groupBy(col("a.media_id").as("doc1"),
            col("b.media_id").as("doc2"))
          .agg(count(lit(1)).as("n_shared_tiles"))
          .filter(col("n_shared_tiles") >= 2)
      },
      Some(s"""$mmTileSigSql,
        rare AS (SELECT tile, thash FROM acc GROUP BY 1, 2
                 HAVING count(*) BETWEEN 2 AND 8),
        ra AS (SELECT acc.* FROM acc JOIN rare USING (tile, thash))
        SELECT a.doc_id AS doc1, b.doc_id AS doc2,
          count(*) AS n_shared_tiles
        FROM ra a JOIN ra b ON a.tile = b.tile AND a.thash = b.thash
          AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2""")),

    ("q_mm_decode",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val pngs = scanFloor(t(s, d, "documents").select("doc_id")).as[Long]
          .map(id => (id, Multimodal.syntheticPng(id, 32, 24)))
        Multimodal.decodeImages(Multimodal.resizeImages(pngs, 8, 6))
          .toDF().select(col("media_id"), col("width"), col("height"),
            col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"))
      },
      // FULL oracle, no codec needed: syntheticPng pixels are pure integer
      // arithmetic of (x, y, id), PNG is lossless, and the resize is the
      // documented nearest-neighbor map sx = x*32/8 = 4x, sy = y*24/6 = 4y
      // — so DuckDB replays the DECODED statistics from the formula. This
      // pins the whole JVM chain (PNG encode -> decode -> resize ->
      // re-encode -> decode) against an engine that never runs a codec.
      Some("""WITH px AS (
          SELECT d.doc_id, ux.x, uy.y
          FROM documents d, UNNEST(range(0, 8)) ux(x),
            UNNEST(range(0, 6)) uy(y))
        SELECT doc_id AS media_id,
          CAST(8 AS INTEGER) AS width, CAST(6 AS INTEGER) AS height,
          CAST(48 AS BIGINT) AS n_pixels,
          CAST(sum((4 * x * 255) // 31) AS BIGINT) AS sum_r,
          CAST(sum((4 * y * 255) // 23) AS BIGINT) AS sum_g,
          CAST(sum(((4 * x + 4 * y + doc_id) % 8) * 32) AS BIGINT) AS sum_b
        FROM px GROUP BY 1""")),

    // REAL audio codec: deterministic PCM triangle waves built and
    // WAV-decoded in the executors; exact peak/sum statistics out
    ("q_mm_wav",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val wavs = scanFloor(t(s, d, "documents").select("doc_id")).as[Long]
          .map(id => (id, Multimodal.syntheticWav(id, 16000,
            320 + (id % 7).toInt * 64)))
        Multimodal.decodeWav(wavs).toDF()
      },
      // FULL oracle from the triangle-wave formula: every sample is
      // (tri*2*amp)//64 with nonnegative operands (Scala `/` = DuckDB
      // `//`), n_frames = 320 + (id%7)*64 is a whole number of 64-sample
      // periods, so sum_abs folds to (n/64) x one-period sum and peak_abs
      // = amp exactly (tri = 32 at phase 32). Pins the WAV encode ->
      // decode roundtrip without the oracle engine touching audio.
      Some("""WITH f AS (SELECT doc_id,
            8000 + (doc_id % 100) * 10 AS amp,
            320 + (doc_id % 7) * 64 AS n
          FROM documents),
        pp AS (SELECT doc_id, CAST(sum(
              ((CASE WHEN u.ph < 32 THEN u.ph ELSE 64 - u.ph END)
                * 2 * amp) // 64) AS BIGINT) AS per_period
          FROM f, UNNEST(range(0, 64)) u(ph) GROUP BY 1)
        SELECT f.doc_id AS media_id, CAST(16000 AS INTEGER) AS sample_rate,
          CAST(1 AS INTEGER) AS channels, CAST(f.n AS BIGINT) AS n_frames,
          CAST(f.amp AS INTEGER) AS peak_abs,
          CAST((f.n // 64) * pp.per_period AS BIGINT) AS sum_abs
        FROM f JOIN pp USING (doc_id)""")),

    ("q_mm_meta",
      (s: SparkSession, d: String) => Multimodal.metadataSummary(
          Multimodal.mediaFromDocuments(s, t(s, d, "documents")))
        .select(col("kind"), col("format"), col("n"),
          col("total_ms").cast("bigint").as("total_ms")),
      Some("""SELECT
          CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
               WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
          CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png'
               WHEN 1 THEN 'wav' ELSE 'mp4' END AS format,
          count(*) AS n,
          CAST(sum(CAST(n_chars * 10 AS INTEGER)) AS BIGINT) AS total_ms
        FROM documents GROUP BY 1, 2""")),

    ("q_mm_features",
      (s: SparkSession, d: String) => {
        val feats = Multimodal.extractFeatures(
          Multimodal.mediaFromDocuments(s,
            scanFloor(t(s, d, "documents"))))
        feats.toDF().select(col("media_id"), col("kind"), col("n_bytes"),
          size(col("feature")).as("feature_dim"))
      },
      Some("""SELECT doc_id AS media_id,
          CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
               WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          16 AS feature_dim
        FROM documents""")))

  // ===================================================== sources & sinks

}
