package graft.multimodal

import org.apache.spark.sql.Dataset

/** A binary payload row: the multimodal column contract — opaque bytes +
  * typed metadata traveling together. */
case class Payload(doc_id: Long, kind: String, payload: Array[Byte])

/** The decoder's output contract: per-payload typed features. */
case class Decoded(doc_id: Long, kind: String, width: Int, height: Int,
                   n_frames: Int, checksum: Long)

/** The mapPartitions decode stage a real multimodal pipeline runs.
  *
  * The actual codec call (jpeg/wav/mp4 decode) needs native libraries
  * this environment does not ship — `decodeOne` is a clearly-marked
  * DETERMINISTIC FAKE standing in for it. Everything around the fake is
  * the real Spark contract and is what the unit suite pins:
  *  - per-PARTITION decoder initialization (expensive codec setup is
  *    amortized across the partition's rows, the reason this is
  *    mapPartitions and not a per-row UDF),
  *  - streaming iterator-to-iterator transform (no partition
  *    materialization — constant memory regardless of partition size),
  *  - 1:1 row contract with a typed output schema.
  *
  * Scale note: a decode stage is pure map work; its partitioning is
  * inherited from the scan, so at 100 TB the only knob is input split
  * size (bytes per task), not anything in this code.
  */
object DecodeStub {

  /** FAKE decode: header-byte "dimensions" + a rolling checksum. The
    * real implementation replaces this body with the codec call. */
  private def decodeOne(p: Payload, decoderEpoch: Long): Decoded = {
    val b = p.payload
    def at(i: Int): Int = if (i < b.length) b(i) & 0xff else 0
    val checksum = b.foldLeft(decoderEpoch)((acc, x) => acc * 31 + (x & 0xff))
    Decoded(p.doc_id, p.kind, at(0) % 64 + 1, at(1) % 64 + 1,
      b.length / 256 + 1, checksum)
  }

  def decode(payloads: Dataset[Payload]): Dataset[Decoded] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      // Real pipeline: decoder/codec handle initialized HERE, once per
      // partition. The stub's "handle" is a fixed epoch so output stays
      // deterministic.
      val decoderEpoch = 17L
      it.map(p => decodeOne(p, decoderEpoch))
    }
  }
}
